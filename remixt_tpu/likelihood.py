"""Read-count likelihood library.

Host-side numpy implementations of the reference's likelihood module
(/root/reference/remixt/likelihood.py:31-1654): phi estimation, expected
read counts, the distribution family (Poisson, negative binomial and its
two-component mixture, binomial, beta-binomial and its uniform mixture),
and composite allele/total likelihood classes with masks and parameter
handles. Used by the init machinery (readdepth), simulations and plotting;
the TPU inference path has its own fused emission kernels in
:mod:`remixt_tpu.models.engine`.
"""

import numpy as np
from scipy.special import gammaln, digamma, betainc


class ProbabilityError(ValueError):
    def __init__(self, message, **variables):
        for name, value in variables.items():
            message += '\n{}={}'.format(name, value)
        super().__init__(message)


class OptimizeParameter(object):
    """Handle exposing a named model parameter to an optimizer
    (likelihood.py:31-68)."""

    def __init__(self, name, attr, bounds, is_scalar, log_likelihood_partial=None):
        self.name = name
        self._attr = attr
        self._bounds = bounds
        self._log_likelihood_partial = log_likelihood_partial
        self.is_scalar = is_scalar

    def get_value(self):
        return getattr(*self._attr)

    def set_value(self, value):
        setattr(self._attr[0], self._attr[1], value)

    value = property(get_value, set_value)

    @property
    def length(self):
        if self.is_scalar:
            return 1
        return self.value.shape[0]

    @property
    def bounds(self):
        if self.is_scalar:
            return self._bounds
        return [self._bounds] * self.length

    def log_likelihood_partial(self, s):
        return self._log_likelihood_partial(self.cn_states[s])

    def __call__(self, cn_states):
        self.cn_states = cn_states
        return self


allele_measurement_matrix = np.array([[1, 0, 1], [0, 1, 1]])


def estimate_phi(x):
    """Proportion of genotypable reads per segment (likelihood.py:71-84)."""
    return x[:, 0:2].sum(axis=1).astype(float) / (x[:, 2].astype(float) + 1.0)


def proportion_measureable_matrix(phi):
    """(N, 3) per-measurement proportion-measurable transform."""
    return np.vstack([phi, phi, np.ones(phi.shape)]).T


def expected_read_count(l, cn, h, phi):
    """Expected (major, minor, total) read counts (likelihood.py:102-134)."""
    p = proportion_measureable_matrix(phi)
    q = allele_measurement_matrix

    gamma = np.sum(cn * np.vstack([h, h]).T, axis=-2)

    x1 = np.dot(q.T, gamma.T).T
    x2 = x1 * p
    x3 = (x2.T * l.T).T
    x3 += 1e-16

    if np.any(x3 <= 0):
        n = np.where(x3 <= 0)[0][0]
        raise ProbabilityError('mu <= 0', n=n, cn=cn[n], l=l[n], h=h, p=p[n], mu=x3[n])
    if np.any(np.isnan(x3)):
        n = np.where(np.isnan(x3))[0][0]
        raise ProbabilityError('mu is nan', n=n, cn=cn[n], l=l[n], h=h, p=p[n], mu=x3[n])

    return x3


def calculate_mean_cn(h, x, l):
    """Mean raw allele copy number per segment (likelihood.py:137-157)."""
    phi = estimate_phi(x)
    depth = x[:, 0:2] / (phi * l)[:, np.newaxis]
    return (depth - h[0]) / h[1:].sum()


def calculate_mean_total_cn(h, x, l):
    """Mean raw total copy number per segment (likelihood.py:160-178)."""
    depth = x[:, 2] / l
    return (depth - h[0]) / h[1:].sum()


# ---------------------------------------------------------------------------
# distributions
# ---------------------------------------------------------------------------

class PoissonDistribution(object):
    """Poisson over total reads (likelihood.py:452-503)."""

    def log_likelihood(self, x, mu):
        mu[mu <= 0] = 1
        ll = x * np.log(mu) - mu - gammaln(x + 1)
        for n in zip(*np.where(np.isnan(ll))):
            raise ProbabilityError('ll is nan', x=x[n], mu=mu[n])
        return ll

    def log_likelihood_partial_mu(self, x, mu):
        return x / mu - 1.0


class NegBinDistribution(object):
    """Negative binomial with mean/overdispersion parameterization
    (likelihood.py:569-664)."""

    def __init__(self, **kwargs):
        self.r = 500.0

    def log_likelihood(self, x, mu):
        nb_p = mu / (self.r + mu)
        nb_p[nb_p < 0.0] = 0.5
        nb_p[nb_p > 1.0] = 0.5
        ll = (gammaln(x + self.r) - gammaln(x + 1) - gammaln(self.r)
              + x * np.log(nb_p) + self.r * np.log(1 - nb_p))
        return ll

    def log_likelihood_partial_mu(self, x, mu):
        return x / mu - (self.r + x) / (self.r + mu)

    def log_likelihood_partial_r(self, x, mu):
        r = self.r
        return (digamma(x + r) - digamma(r) + np.log(r) + 1.0
                - np.log(r + mu) - r / (r + mu) - x / (r + mu))


class NegBinMixtureDistribution(object):
    """Mixture of a negative binomial with a high-variance noise negbin
    (likelihood.py:666-761)."""

    def __init__(self, **kwargs):
        self.negbin = NegBinDistribution()
        self.negbin_noise = NegBinDistribution()
        self.negbin_noise.r = 10.0
        self.z = 0.01

    @property
    def r(self):
        return self.negbin.r

    @r.setter
    def r(self, value):
        self.negbin.r = value

    @property
    def r_noise(self):
        return self.negbin_noise.r

    @r_noise.setter
    def r_noise(self, value):
        self.negbin_noise.r = value

    def log_likelihood(self, x, mu):
        ll_signal = self.negbin.log_likelihood(x, mu) + np.log(1 - self.z)
        ll_noise = self.negbin_noise.log_likelihood(x, mu) + np.log(self.z)
        ll = np.logaddexp(ll_signal, ll_noise)
        return ll

    def log_likelihood_partial_mu(self, x, mu):
        ll_signal = self.negbin.log_likelihood(x, mu) + np.log(1 - self.z)
        ll_noise = self.negbin_noise.log_likelihood(x, mu) + np.log(self.z)
        ll = np.logaddexp(ll_signal, ll_noise)
        w_signal = np.exp(ll_signal - ll)
        w_noise = np.exp(ll_noise - ll)
        return (w_signal * self.negbin.log_likelihood_partial_mu(x, mu)
                + w_noise * self.negbin_noise.log_likelihood_partial_mu(x, mu))


class BinomialDistribution(object):
    """Binomial over minor allele reads (likelihood.py:887-947)."""

    def __init__(self, **kwargs):
        pass

    def log_likelihood(self, k, n, p):
        ll = (gammaln(n + 1) - gammaln(k + 1) - gammaln(n - k + 1)
              + k * np.log(p) + (n - k) * np.log(1 - p))
        return ll

    def log_likelihood_partial_p(self, k, n, p):
        return k / p - (n - k) / (1 - p)


class BetaBinDistribution(object):
    """Beta-binomial over minor allele reads (likelihood.py:949-1086)."""

    def __init__(self, **kwargs):
        self.M = 500.0

    def log_likelihood(self, k, n, p):
        M = self.M
        ll = (gammaln(n + 1) - gammaln(k + 1) - gammaln(n - k + 1)
              + gammaln(k + M * p) + gammaln(n - k + M * (1 - p))
              - gammaln(n + M)
              - gammaln(M * p) - gammaln(M * (1 - p))
              + gammaln(M))
        return ll

    def log_likelihood_partial_p(self, k, n, p):
        M = self.M
        return (M * digamma(k + M * p)
                - M * digamma(n - k + M * (1 - p))
                - M * digamma(M * p)
                + M * digamma(M * (1 - p)))

    def log_likelihood_partial_M(self, k, n, p):
        M = self.M
        return (p * digamma(k + M * p)
                + (1 - p) * digamma(n - k + M * (1 - p))
                - digamma(n + M)
                - p * digamma(M * p) - (1 - p) * digamma(M * (1 - p))
                + digamma(M))


class BetaBinUniformDistribution(object):
    """Beta-binomial mixed with a uniform outlier component
    (likelihood.py:1087-1211)."""

    def __init__(self, **kwargs):
        self.betabin = BetaBinDistribution()
        self.z = 0.01

    @property
    def M(self):
        return self.betabin.M

    @M.setter
    def M(self, value):
        self.betabin.M = value

    def log_likelihood(self, k, n, p):
        ll_signal = self.betabin.log_likelihood(k, n, p) + np.log(1 - self.z)
        ll_noise = -np.log(n + 1.0) + np.log(self.z)
        return np.logaddexp(ll_signal, ll_noise)

    def _weights(self, k, n, p):
        ll_signal = self.betabin.log_likelihood(k, n, p) + np.log(1 - self.z)
        ll_noise = -np.log(n + 1.0) + np.log(self.z)
        ll = np.logaddexp(ll_signal, ll_noise)
        return np.exp(ll_signal - ll)

    def log_likelihood_partial_p(self, k, n, p):
        return self._weights(k, n, p) * self.betabin.log_likelihood_partial_p(k, n, p)

    def log_likelihood_partial_M(self, k, n, p):
        return self._weights(k, n, p) * self.betabin.log_likelihood_partial_M(k, n, p)


# ---------------------------------------------------------------------------
# likelihood models
# ---------------------------------------------------------------------------

class ReadCountLikelihood(object):
    """Base read-count likelihood with masks and parameter handles
    (likelihood.py:181-371)."""

    def __init__(self, x, l, **kwargs):
        self.x = x
        self.l = l

        self.param_partial_func = dict()
        self.param_bounds = dict()
        self.param_per_segment = dict()

        self.mask = np.array([True] * len(self.l))

    def add_amplification_mask(self, cn_max):
        """Mask segments whose mean total copy number exceeds cn_max
        (likelihood.py:205-217)."""
        dom_cn = calculate_mean_total_cn(self.h, self.x, self.l)
        dom_cn[np.isnan(dom_cn)] = np.inf
        dom_cn = np.clip(dom_cn.round().astype(int), 0, int(1e6))
        self.mask &= (dom_cn <= cn_max)

    def add_segment_length_mask(self, min_segment_length):
        self.mask &= (self.l >= min_segment_length)

    def add_proportion_genotyped_mask(self, min_proportion_genotyped):
        p = self.x[:, :2].sum(axis=1).astype(float) / (self.x[:, 2].astype(float) + 1e-16)
        self.mask &= (p >= min_proportion_genotyped)

    def _get_h(self):
        return self._h

    def _set_h(self, value):
        self._h = value.copy()
        self._h[self._h < 0.] = 0.

    h = property(fget=_get_h, fset=_set_h)

    def expected_read_count(self, l, cn):
        """Expected (major, minor, total) counts given copy number."""
        return expected_read_count(l, cn, self.h, self.phi)

    def expected_total_read_count(self, l, cn):
        h = self.h
        mu = l * (h * cn.sum(axis=2)).sum(axis=1)
        mu += 1e-16
        if np.any(mu <= 0) or np.any(np.isnan(mu)):
            raise ProbabilityError('mu <= 0 or nan', h=h)
        return mu

    def expected_allele_ratio(self, cn):
        h = self.h
        minor = (h * cn[:, :, 1]).sum(axis=1)
        total = (h * cn.sum(axis=2)).sum(axis=1)
        p = minor / total
        p = np.clip(p, 1e-16, 1. - 1e-16)
        if np.any(np.isnan(p)):
            raise ProbabilityError('p is nan', h=h)
        return p

    def _log_likelihood_post(self, ll, cn):
        """Shared post-processing: negative-copy guard, masking, nan/inf
        raises (likelihood.py:327-349)."""
        ll[np.where(np.any(cn < 0, axis=(-1, -2)))] = -np.inf
        ll[~self.mask] = 0.0
        if np.any(np.isnan(ll)):
            n = np.where(np.isnan(ll))[0][0]
            raise ProbabilityError('ll is nan', n=n, cn=cn[n], x=self.x[n], l=self.l[n])
        if np.any(np.isinf(ll)):
            n = np.where(np.isinf(ll))[0][0]
            raise ProbabilityError('ll is infinite', n=n, cn=cn[n], x=self.x[n], l=self.l[n])
        return ll

    def log_likelihood(self, cn):
        return self._log_likelihood_post(self._log_likelihood(cn), cn)


class IndepAlleleLikelihood(ReadCountLikelihood):
    """Independent per-allele measurement likelihood (likelihood.py:374-449)."""

    def __init__(self, **kwargs):
        super().__init__(**kwargs)


class PoissonLikelihood(IndepAlleleLikelihood):
    """Poisson allele/total likelihood (likelihood.py:505-566)."""

    def __init__(self, **kwargs):
        self.poisson = PoissonDistribution()
        super().__init__(**kwargs)

    def _log_likelihood(self, x, l, cn):
        N, K = x.shape[0], x.shape[1]
        mu = self.expected_read_count(l, cn)
        ll = np.zeros(N)
        for k in range(K):
            ll = ll + self.poisson.log_likelihood(x[:, k], mu[:, k])
        return ll


class NegBinLikelihood(IndepAlleleLikelihood):
    """Negative binomial allele/total likelihood (likelihood.py:765-884)."""

    def __init__(self, **kwargs):
        self.distr = [NegBinDistribution(), NegBinDistribution(), NegBinDistribution()]
        super().__init__(**kwargs)

    @property
    def r(self):
        return np.array([d.r for d in self.distr])

    @r.setter
    def r(self, value):
        for d, v in zip(self.distr, value):
            d.r = max(0.0, v)

    def _log_likelihood(self, x, l, cn):
        N, K = x.shape[0], x.shape[1]
        mu = self.expected_read_count(l, cn)
        ll = np.zeros(N)
        for k in range(K):
            ll = ll + self.distr[k].log_likelihood(x[:, k], mu[:, k])
        return ll


class NegBinBetaBinLikelihood(ReadCountLikelihood):
    """Composite total-negbin + allele-betabin likelihood with hdel/LOH
    special cases (likelihood.py:1214-1654). The emission model the TPU
    engine implements (engine.emission_tensors)."""

    def __init__(self, x, l, **kwargs):
        super().__init__(x, l, **kwargs)

        self.hdel_mu = 1e-5
        self.loh_p = 1e-3

        self.negbin = NegBinMixtureDistribution()
        self.negbin_hdel = NegBinMixtureDistribution()
        self.betabin = BetaBinUniformDistribution()
        self.betabin_loh = BetaBinUniformDistribution()

        self.phi = estimate_phi(x)

    def h_param(self, cn_states):
        return OptimizeParameter(
            'h', (self, 'h'), (1e-16, 10.), False,
            log_likelihood_partial=lambda cn: self.log_likelihood_partial_h(cn))

    def r_param(self, cn_states):
        return OptimizeParameter('r', (self.negbin, 'r'), (10., 5000.), True)

    def M_param(self, cn_states):
        return OptimizeParameter('M', (self.betabin, 'M'), (10., 5000.), True)

    def betabin_loh_p_param(self, cn_states):
        return OptimizeParameter('betabin_loh_p', (self, 'loh_p'), (1e-5, 0.01), True)

    def negbin_hdel_mu_param(self, cn_states):
        return OptimizeParameter('negbin_hdel_mu', (self, 'hdel_mu'), (1e-7, 1e-2), True)

    def _log_likelihood_total(self, x, l, cn):
        is_hdel = np.all(cn == 0, axis=(1, 2))
        mu = self.expected_total_read_count(l, cn)
        mu[is_hdel] = self.hdel_mu * l[is_hdel] + 1e-16

        ll = np.where(
            is_hdel,
            self.negbin_hdel.log_likelihood(x[:, 2], mu),
            self.negbin.log_likelihood(x[:, 2], mu))
        return ll

    def _log_likelihood_allele(self, x, l, cn):
        is_loh = np.any(cn.sum(axis=1) == 0, axis=-1)
        total = (self.h * cn.sum(axis=2)).sum(axis=1)
        minor = (self.h * cn[:, :, 1]).sum(axis=1)
        with np.errstate(divide='ignore', invalid='ignore'):
            p = np.where(total > 0, minor / np.where(total > 0, total, 1.), 0.5)
        p_loh = np.where(p < 0.5, self.loh_p, 1. - self.loh_p)
        p = np.where(is_loh, p_loh, np.clip(p, 1e-16, 1. - 1e-16))

        k = x[:, 1]
        n = x[:, 0] + x[:, 1]

        ll = np.where(
            is_loh,
            self.betabin_loh.log_likelihood(k, n, p),
            self.betabin.log_likelihood(k, n, p))
        ll = np.where(n == 0, 0.0, ll)
        return ll

    def _log_likelihood(self, cn):
        return (self._log_likelihood_total(self.x, self.l, cn)
                + self._log_likelihood_allele(self.x, self.l, cn))

    def log_likelihood_total(self, cn):
        return self._log_likelihood_post(
            self._log_likelihood_total(self.x, self.l, cn), cn)

    def log_likelihood_alleles(self, cn):
        return self._log_likelihood_post(
            self._log_likelihood_allele(self.x, self.l, cn), cn)
