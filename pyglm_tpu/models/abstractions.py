"""Mixin contracts for distributions and models.

Capability parity with ``pybasicbayes/abstractions.py`` (``Distribution``,
``GibbsSampling``, ``Model``, ``ModelGibbsSampling``): the duck-typed
interface every pyglm object follows. In this rebuild the heavy lifting is
done by pure jitted functions; these ABCs exist so user code written against
the reference's object contract ports directly.
"""
from __future__ import annotations

import abc


class Distribution(abc.ABC):
    """Reference contract: rvs() and log_likelihood()."""

    @abc.abstractmethod
    def rvs(self, *args, **kwargs):
        """Sample from the distribution."""

    @abc.abstractmethod
    def log_likelihood(self, x):
        """Log density/mass of data under the current parameters."""


class GibbsSampling(Distribution):
    """Adds resample(data): one draw from the conditional posterior."""

    @abc.abstractmethod
    def resample(self, data=None):
        ...


class Model(abc.ABC):
    @abc.abstractmethod
    def add_data(self, data):
        ...

    @abc.abstractmethod
    def generate(self, *args, **kwargs):
        ...


class ModelGibbsSampling(Model):
    @abc.abstractmethod
    def resample_model(self):
        ...
