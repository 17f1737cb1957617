"""Quick-lane Geweke smoke: a short successive-conditional chain on the
flagship config with loose bounds. The full per-prior/per-family suite
(3000-iteration chains) lives in test_geweke.py behind ``-m slow``."""
import numpy as np
import jax

from pyglm_tpu.ops.basis import cosine_basis
from pyglm_tpu.models.observations import Bernoulli
from pyglm_tpu.models.networks import ErdosRenyiConfig
from pyglm_tpu.diagnostics.geweke import geweke_chain


def test_geweke_smoke_bernoulli_er():
    N, B, L, T = 3, 1, 3, 50
    net = ErdosRenyiConfig(
        N=N, B=B, rho_init=0.4, learn_rho=False, learn_weight_prior=False,
        sigma_w=0.5, mu_bias=-1.0, sigma_bias=0.3)
    series = geweke_chain(jax.random.key(0), Bernoulli(), net, N, B,
                          cosine_basis(B=B, L=L), T, spike_slab=True,
                          n_iters=600)
    b = series["bias"][::10]
    z = abs(b.mean() - net.mu_bias) / np.sqrt(net.sigma_bias ** 2 / b.size)
    assert z < 6.0, (b.mean(), z)
    dens = series["A_density"][::10]
    z = abs(dens.mean() - 0.4) / np.sqrt(0.24 / (dens.size * N * N))
    assert z < 6.0, (dens.mean(), z)
