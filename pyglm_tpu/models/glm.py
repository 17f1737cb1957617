"""Placeholder — full model layer lands next milestone."""
NonlinearAutoregressiveModel = GLM = BernoulliGLM = SparseBernoulliGLM = None
GaussianGLM = SparseGaussianGLM = NegativeBinomialGLM = None
SparseNegativeBinomialGLM = BinomialGLM = None
