"""Small shared utilities (ref: inference/common/common_utils.py:22-42)."""

from __future__ import annotations

import os
import random

import jax
import numpy as np


def env_is_true(name: str) -> bool:
    """Env-var flag system (ref: common_utils.py:22-25)."""
    value = os.getenv(name, "0")
    return value.lower() in ("1", "true", "yes", "on")


def divide(numerator: int, denominator: int) -> int:
    assert numerator % denominator == 0, f"{numerator} is not divisible by {denominator}"
    return numerator // denominator


def cdiv(a: int, b: int) -> int:
    return -(-a // b)


def round_up(x: int, m: int) -> int:
    return cdiv(x, m) * m


def set_random_seed(seed: int) -> jax.Array:
    """Seed python/numpy and return the root JAX PRNG key
    (ref: common_utils.py:31-42; JAX threads keys explicitly)."""
    random.seed(seed)
    np.random.seed(seed)
    return jax.random.PRNGKey(seed)
