"""Trace-safe probe for the platform computations actually land on.

On this stack the axon TPU plugin registers in every interpreter and ignores
JAX_PLATFORMS, so `jax.default_backend()` can say "tpu" while everything is
pinned to CPU via `jax.config.jax_default_device` (tests/conftest.py does
exactly that). Kernel-choice branches (one-hot sampler, fused s2d stem,
flash attention) must honor the pin or they pick MXU-shaped code paths on
CPU. The config value may be a Device object OR a platform string
(`jax.config.update('jax_default_device', 'cpu')` is legal), so guard both.

No device allocation happens here — safe to call at trace time inside jit.
"""

from __future__ import annotations

import jax


def committed_platform() -> str:
    """Platform of the default device if pinned, else the default backend."""
    dev = jax.config.jax_default_device
    if dev is None:
        return jax.default_backend()
    if isinstance(dev, str):
        return dev
    return getattr(dev, "platform", jax.default_backend())
