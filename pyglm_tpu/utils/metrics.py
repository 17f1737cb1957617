"""Evaluation metrics for network-GLM inference.

The paper-standard deliverables (SURVEY.md §3.4): held-out predictive
log-likelihood averaged over posterior samples, and link-detection AUC of
posterior edge marginals against a ground-truth adjacency.
"""
from __future__ import annotations

import numpy as np


def link_auc(edge_scores, A_true):
    """AUC of edge scores (e.g. posterior mean of A) vs true adjacency."""
    s = np.asarray(edge_scores, float).ravel()
    t = np.asarray(A_true).ravel().astype(bool)
    pos, neg = s[t], s[~t]
    if len(pos) == 0 or len(neg) == 0:
        return 1.0
    # O(E log E) rank-based AUC.
    order = np.argsort(np.concatenate([pos, neg]), kind="mergesort")
    ranks = np.empty(len(s))
    ranks[order] = np.arange(1, len(s) + 1)
    # midranks for ties
    vals = np.concatenate([pos, neg])
    sorted_vals = vals[order]
    i = 0
    while i < len(s):
        j = i
        while j + 1 < len(s) and sorted_vals[j + 1] == sorted_vals[i]:
            j += 1
        if j > i:
            ranks[order[i:j + 1]] = 0.5 * (i + j) + 1
        i = j + 1
    r_pos = ranks[: len(pos)]
    return (r_pos.sum() - len(pos) * (len(pos) + 1) / 2) / (len(pos) * len(neg))


def predictive_log_likelihood(model, Y_test, n_samples: int = 20,
                              thin: int = 1):
    """Posterior-averaged predictive log-likelihood of held-out spikes.

    Continues the model's Gibbs chain for n_samples*thin sweeps, evaluating
    log p(Y_test | theta_s) every `thin` sweeps, and returns
    logmeanexp over samples (the paper's protocol) plus the per-sample
    values. The chain state advances as a side effect (it is an MCMC run).
    """
    lls = []
    for s in range(n_samples):
        for _ in range(thin):
            model.resample_model()
        lls.append(model.log_likelihood(Y_test))
    lls = np.asarray(lls)
    m = lls.max()
    return float(m + np.log(np.mean(np.exp(lls - m)))), lls


def split_rhat(chains):
    """Split-R̂ (Gelman–Rubin potential scale reduction, rank-free form)
    per scalar component.

    Args:
      chains: (C, S, ...) array — C independent chains of S post-burn-in
        samples of an arbitrarily-shaped quantity (e.g. the (S, N, N) A
        traces of several ``fit()`` runs stacked on axis 0).
    Returns an array of shape ``chains.shape[2:]``: R̂ per component, the
    sqrt of (within + between) / within variance over the 2C half-chains.
    Values ≲ 1.01 indicate the chains agree; use with `fit` over multiple
    seeds as the standard multi-chain convergence check (the reference's
    user-owned MCMC loop has no convergence tooling; this is the canonical
    diagnostic for it).
    """
    x = np.asarray(chains, np.float64)
    C, S = x.shape[:2]
    assert C >= 2 and S >= 4, (C, S)
    half = S // 2
    # split each chain into two halves -> (2C, half, ...)
    x = np.concatenate([x[:, :half], x[:, half: 2 * half]], axis=0)
    m = x.shape[0]
    mean_j = x.mean(axis=1)                         # (2C, ...)
    var_j = x.var(axis=1, ddof=1)                   # (2C, ...)
    W = var_j.mean(axis=0)
    B = half * mean_j.var(axis=0, ddof=1)
    var_plus = (half - 1) / half * W + B / half
    with np.errstate(divide="ignore", invalid="ignore"):
        rhat = np.sqrt(var_plus / W)
    # W == 0 needs care: a component constant within every half-chain is
    # trivially converged ONLY if the chains also agree (B ~ 0, e.g. an
    # edge pinned at 0 everywhere). Constant-but-different across chains
    # (e.g. an inclusion indicator frozen at 1 in one chain and 0 in
    # another — a multimodal posterior) is the exact divergence R̂ exists
    # to flag: report +inf, not 1.
    tiny = 1e-12 * max(1.0, float(np.max(np.abs(mean_j))) ** 2)
    return np.where(W > 0, rhat, np.where(B <= tiny, 1.0, np.inf))


def ess_per_chain(x):
    """Effective sample size of a (S,) scalar trace via the initial-
    positive-sequence autocorrelation estimator (Geyer 1992)."""
    x = np.asarray(x, np.float64)
    n = x.size
    x = x - x.mean()
    var = np.mean(x * x)
    if var <= 0:
        return float(n)
    acf = np.correlate(x, x, mode="full")[n - 1:] / (var * n)
    tau, k = 1.0, 1
    while k + 1 < n:
        pair = acf[k] + acf[k + 1]
        if pair < 0:
            break
        tau += 2.0 * pair
        k += 2
    return float(n / max(tau, 1.0))


def bits_per_spike(pll, Y_test, baseline_rate=None):
    """Convert predictive log-lik (nats) to bits/spike vs a homogeneous
    baseline — the paper's normalized metric."""
    Y = np.asarray(Y_test)
    n_spikes = Y.sum()
    T, N = Y.shape
    rate = Y.mean() if baseline_rate is None else baseline_rate
    rate = min(max(rate, 1e-12), 1 - 1e-12)
    ll_base = (Y.sum() * np.log(rate) + (T * N - Y.sum()) * np.log(1 - rate))
    return float((pll - ll_base) / max(n_spikes, 1) / np.log(2))
