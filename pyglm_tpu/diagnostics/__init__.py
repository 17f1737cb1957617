from pyglm_tpu.diagnostics.geweke import geweke_chain, ks_two_sample
