"""mcfit shim: P2xi / xi2P as a self-contained FFTLog (Hamilton 2000)
following mcfit's conventions (see README.md).

Deliberately independent of vega_tpu.ops.fftlog: the low-ringing offset
comes from scipy.fft.fhtoffset, the kernel from scipy loggamma, padding
follows mcfit's documented power-of-two default. The unpadded limit is
cross-validated against scipy.fft.fht in tests/test_reference_goldens.py.
"""

import numpy as np
from scipy.fft import fhtoffset
from scipy.special import loggamma


def _u_kernel(n, delta, mu, lnxy):
    m = np.fft.fftfreq(n) * n
    alpha = 2j * np.pi * m / (n * delta)
    z = 1.0 + alpha
    lg = loggamma((mu + z) / 2) - loggamma((mu - z) / 2 + 1)
    u = np.exp((z - 1) * np.log(2.0) + lg - alpha * lnxy)
    u[0] = u[0].real
    if n % 2 == 0:
        u[n // 2] = u[n // 2].real
    return u


class _SphericalHankel:
    """Shared machinery for the l-th spherical-Bessel Hankel pair."""

    def __init__(self, x, l=0, lowring=True):
        x = np.asarray(x, dtype=np.float64)
        self.x = x
        self.l = l
        n = len(x)
        self.n = n
        self.delta = np.log(x[-1] / x[0]) / (n - 1)
        mu = l + 0.5
        self.lnxy = (fhtoffset(self.delta, mu=mu, bias=0) if lowring
                     else 0.0)
        self.y = np.exp(self.lnxy) / x[::-1]
        # mcfit default convolution length: smallest power of 2 that at
        # least doubles the input
        self.n_fft = 2 ** int(np.ceil(np.log2(2 * n)))
        self._u = _u_kernel(self.n_fft, self.delta, mu, self.lnxy)
        self._pad_l = (self.n_fft - n) // 2

    def _extend(self, a, extrap):
        """Zero padding, or power-law continuation when extrap=True."""
        n, n_fft = self.n, self.n_fft
        pad_l = self._pad_l
        pad_r = n_fft - n - pad_l
        f = np.zeros(n_fft, dtype=np.float64)
        f[pad_l:pad_l + n] = a
        if extrap:
            if a[0] != 0 and a[1] != 0 and np.sign(a[0]) == np.sign(a[1]):
                rho = abs(a[0] / a[1])
                f[:pad_l] = a[0] * rho ** np.arange(pad_l, 0, -1)
            if a[-1] != 0 and a[-2] != 0 \
                    and np.sign(a[-1]) == np.sign(a[-2]):
                rho = abs(a[-1] / a[-2])
                f[pad_l + n:] = a[-1] * rho ** np.arange(1, pad_r + 1)
        return f

    def convolve(self, a, extrap=False):
        f = self._extend(np.asarray(a, dtype=np.float64), extrap)
        g = np.fft.ifft(np.fft.fft(f) * self._u).real
        return g[self._pad_l:self._pad_l + self.n][::-1]


class P2xi:
    """xi_l(r) = (-1)^(l/2)/(2 pi^2) Int k^2 dk j_l(kr) P_l(k), mcfit
    call surface: P2xi(k, l=..., lowring=...)(pk, extrap=...)."""

    def __init__(self, k, l=0, lowring=True, **kwargs):
        self._h = _SphericalHankel(k, l=l, lowring=lowring)
        sign = -1.0 if (l // 2) % 2 else 1.0
        self._pre = self._h.x ** 1.5
        self._post = (sign / (2 * np.pi ** 2) * np.sqrt(np.pi / 2)
                      * self._h.y ** -1.5)

    def __call__(self, pk, extrap=False):
        xi = self._post * self._h.convolve(pk * self._pre, extrap=extrap)
        return self._h.y, xi


class xi2P:
    """Inverse: P_l(k) = 4 pi (-1)^(l/2) Int r^2 dr j_l(kr) xi_l(r)."""

    def __init__(self, r, l=0, lowring=True, **kwargs):
        self._h = _SphericalHankel(r, l=l, lowring=lowring)
        sign = -1.0 if (l // 2) % 2 else 1.0
        self._pre = self._h.x ** 1.5
        self._post = (sign * 4 * np.pi * np.sqrt(np.pi / 2)
                      * self._h.y ** -1.5)

    def __call__(self, xi, extrap=False):
        pk = self._post * self._h.convolve(xi * self._pre, extrap=extrap)
        return self._h.y, pk
