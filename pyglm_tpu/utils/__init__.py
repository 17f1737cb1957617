from pyglm_tpu.utils.utils import logistic, logit, expand_scalar, expand_cov
