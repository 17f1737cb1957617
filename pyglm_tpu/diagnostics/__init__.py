from pyglm_tpu.diagnostics.geweke import geweke_chain, geweke_ks
