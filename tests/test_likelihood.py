"""Distribution log-pmfs and analytic partials.

The reference pattern (test_likelihood.py: distribution checks plus
assert_grad_correct numeric differentiation) applied to the functional
likelihood library: log-pmfs validated against scipy.stats, partials
validated by central differences.
"""

import numpy as np
import pytest
import scipy.stats

from remixt_tpu import likelihood as lik


RNG = np.random.RandomState(0)
X = RNG.poisson(50, size=20).astype(float)
N_TRIALS = X + RNG.poisson(30, size=20)
MU = 40.0 + 20.0 * RNG.rand(20)
P = np.clip(RNG.rand(20), 0.1, 0.9)


def central_diff(f, x, eps=None):
    # step scaled to the argument magnitude for stable differences
    eps = 1e-6 * max(1.0, float(np.max(np.abs(x)))) if eps is None else eps
    return (f(x + eps) - f(x - eps)) / (2 * eps)


def test_poisson_log_pmf_matches_scipy():
    np.testing.assert_allclose(
        lik.poisson_log_pmf(X, MU),
        scipy.stats.poisson.logpmf(X, MU), rtol=1e-10)


def test_negbin_log_pmf_matches_scipy():
    r = 100.0
    # scipy parameterization: n=r, p = r/(r+mu)
    np.testing.assert_allclose(
        lik.negbin_log_pmf(X, MU, r),
        scipy.stats.nbinom.logpmf(X, r, r / (r + MU)), rtol=1e-10)


def test_betabin_log_pmf_matches_scipy():
    M = 200.0
    np.testing.assert_allclose(
        lik.betabin_log_pmf(X, N_TRIALS, P, M),
        scipy.stats.betabinom.logpmf(X, N_TRIALS, M * P, M * (1 - P)),
        rtol=1e-9)


def test_binomial_log_pmf_matches_scipy():
    np.testing.assert_allclose(
        lik.binomial_log_pmf(X, N_TRIALS, P),
        scipy.stats.binom.logpmf(X, N_TRIALS, P), rtol=1e-9)


@pytest.mark.parametrize('partial,wrt', [
    (lik.poisson_partial_mu, 'mu'),
    (lik.negbin_partial_mu, 'mu'),
    (lik.negbin_partial_r, 'r'),
])
def test_total_count_partials(partial, wrt):
    r = 80.0
    if partial is lik.poisson_partial_mu:
        analytic = partial(X, MU)
        numeric = central_diff(lambda m: lik.poisson_log_pmf(X, m), MU)
    elif wrt == 'mu':
        analytic = partial(X, MU, r)
        numeric = central_diff(lambda m: lik.negbin_log_pmf(X, m, r), MU)
    else:
        analytic = partial(X, MU, r)
        numeric = central_diff(lambda rr: lik.negbin_log_pmf(X, MU, rr), r)
    np.testing.assert_allclose(analytic, numeric, rtol=1e-5, atol=1e-7)


@pytest.mark.parametrize('partial,wrt', [
    (lik.betabin_partial_p, 'p'),
    (lik.betabin_partial_M, 'M'),
    (lik.betabin_uniform_partial_p, 'p'),
    (lik.betabin_uniform_partial_M, 'M'),
])
def test_allele_partials(partial, wrt):
    M, z = 150.0, 0.02
    uniform = partial in (lik.betabin_uniform_partial_p,
                          lik.betabin_uniform_partial_M)

    def pmf(p=P, m=M):
        if uniform:
            return lik.betabin_uniform_log_pmf(X, N_TRIALS, p, m, z)
        return lik.betabin_log_pmf(X, N_TRIALS, p, m)

    args = (X, N_TRIALS, P, M, z) if uniform else (X, N_TRIALS, P, M)
    analytic = partial(*args)
    if wrt == 'p':
        numeric = central_diff(lambda p: pmf(p=p), P)
    else:
        numeric = central_diff(lambda m: pmf(m=m), M)
    np.testing.assert_allclose(analytic, numeric, rtol=1e-5, atol=1e-7)


def test_mixture_pmfs_normalize_against_components():
    """Mixture pmf must sit between its components and approach them at
    z -> 0 / z -> 1."""
    r0, r1 = 500.0, 10.0
    lo = lik.negbin_mixture_log_pmf(X, MU, r0, r1, 1e-12)
    np.testing.assert_allclose(lo, lik.negbin_log_pmf(X, MU, r0), rtol=1e-6)
    hi = lik.negbin_mixture_log_pmf(X, MU, r0, r1, 1.0 - 1e-12)
    np.testing.assert_allclose(hi, lik.negbin_log_pmf(X, MU, r1), rtol=1e-6)


def test_expected_read_count_shapes_and_guards():
    N, M = 10, 3
    cn = np.ones((N, M, 2))
    h = np.array([0.1, 0.05, 0.02])
    l = np.full(N, 1e6)
    phi = np.full(N, 0.1)
    mu = lik.expected_read_count(l, cn, h, phi)
    assert mu.shape == (N, 3)
    # total = sum over clones of h * total copies * l
    np.testing.assert_allclose(mu[:, 2], 2 * h.sum() * 1e6, rtol=1e-9)
    # allele measurements scaled by phi
    np.testing.assert_allclose(mu[:, 0], 0.1 * h.sum() * 1e6, rtol=1e-9)

    with pytest.raises(lik.ProbabilityError):
        lik.expected_read_count(l, cn, np.array([np.nan, 0.05, 0.02]), phi)
