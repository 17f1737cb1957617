from pyglm_tpu.reference.numpy_ref import NumpyGLMReference, numpy_pg_devroye
