from pyglm_tpu.ops.basis import cosine_basis, convolve_with_basis
from pyglm_tpu.ops.polyagamma import polya_gamma, pg_devroye, pg_gamma_series, pg_normal_approx, pg_mean, pg_var
