from pyglm_tpu.compat.pypolyagamma import PyPolyaGamma, pgdrawv, pgdrawvpar
