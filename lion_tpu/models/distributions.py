"""Reparameterized Normal (reference: models/distributions.py:11-35).

Functional: sampling takes an explicit PRNG key (JAX discipline) instead of
mutating global RNG state.
"""
from __future__ import annotations

import math

import jax
import jax.numpy as jnp

# math.log, NOT jnp.log: import-time device compute would make the whole
# package un-importable whenever the default backend is unhealthy.
_LOG_2PI = math.log(2.0 * math.pi)


class Normal:
    def __init__(self, mu, log_sigma, sigma=None):
        self.mu = mu
        self.log_sigma = log_sigma
        self.sigma = jnp.exp(log_sigma) if sigma is None else sigma

    def sample(self, rng, t: float = 1.0):
        rho = jax.random.normal(rng, self.mu.shape, self.mu.dtype)
        return rho * (self.sigma * t) + self.mu, rho

    def sample_given_rho(self, rho):
        return rho * self.sigma + self.mu

    def mean(self):
        return self.mu

    def log_p(self, samples):
        normalized = (samples - self.mu) / self.sigma
        return (-0.5 * normalized * normalized - 0.5 * _LOG_2PI
                - self.log_sigma)

    def kl_to_standard(self):
        """Pointwise KL(q || N(0,1)) = 0.5*sigma^2 + 0.5*mu^2 - log_sigma - 0.5
        (the closed form used in vae_adain.py:250-252)."""
        return (0.5 * jnp.exp(self.log_sigma) ** 2 + 0.5 * self.mu ** 2
                - self.log_sigma - 0.5)
