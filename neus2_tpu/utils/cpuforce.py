"""Force a process onto the CPU backend even with the axon TPU plugin loaded.

The axon tunnel plugin registers itself at interpreter start (sitecustomize)
and sets ``jax_platforms="axon,cpu"``, overriding the ``JAX_PLATFORMS`` env
var.  The first backend query (``jax.devices()`` — even ``jax.devices("cpu")``)
then initializes EVERY listed platform, and the axon PJRT client blocks
indefinitely when the tunnel relay is down.  Updating ``jax_platforms`` to
``"cpu"`` *before* the first backend init keeps the axon client out of the
process entirely; once backends are initialized the best we can do is pin the
default device (which requires a live tunnel to have succeeded already).
"""

import jax


def force_cpu() -> None:
    """Make this process CPU-only; safe to call multiple times."""
    try:
        from jax._src import xla_bridge as _xb

        initialized = _xb.backends_are_initialized()
    except Exception:
        initialized = True  # conservative: don't touch the platform list
    if not initialized:
        try:
            jax.config.update("jax_platforms", "cpu")
            return
        except Exception:
            pass
    # Fallback: backends already up (or the platform list is locked) — pin
    # the default device so compute lands on CPU.
    try:
        jax.config.update("jax_default_device", jax.devices("cpu")[0])
    except RuntimeError:
        pass


def force_cpu_if_requested() -> None:
    """Honor ``JAX_PLATFORMS=cpu`` even though the axon plugin overrides it."""
    import os

    if os.environ.get("JAX_PLATFORMS", "").startswith("cpu"):
        force_cpu()
