"""Persistent XLA compilation cache.

A fresh process pays ~15-30 s of remote compilation per jitted entry point
(~3 minutes before the first whole-genome fit — FIT_BUDGET.json
``full_fit_cold_s``). The reference has no analogous cost: its Cython
kernels compile at install time. JAX's persistent compilation cache is the
TPU-era equivalent of that install-time compile — executables serialize to
a directory keyed by (HLO, compile options, backend version), so the
second process's "cold" fit deserializes in seconds.

No reference counterpart; knobs in defaults.py (``use_compilation_cache``,
``compilation_cache_dir``) with the usual YAML overlay.
"""

import logging
import os

logger = logging.getLogger('remixt_tpu.compile_cache')

_enabled_dir = None


def default_cache_dir():
    env = os.environ.get('REMIXT_TPU_CACHE_DIR')
    if env:
        return env
    return os.path.join(os.path.expanduser('~'), '.cache', 'remixt_tpu',
                        'xla_cache')


def enable_compilation_cache(config=None, cache_dir=None):
    """Idempotently enable JAX's persistent compilation cache.

    Resolution order: explicit ``cache_dir`` argument, config overlay
    (``compilation_cache_dir``), REMIXT_TPU_CACHE_DIR, then the per-user
    default. A falsy ``use_compilation_cache`` in the config disables it.
    Returns the active directory, or None when disabled/unavailable.
    """
    global _enabled_dir
    import remixt_tpu.config

    if config is not None and not remixt_tpu.config.get_param(
            config, 'use_compilation_cache'):
        return None
    if cache_dir is None and config is not None:
        cache_dir = remixt_tpu.config.get_param(
            config, 'compilation_cache_dir')
    if cache_dir is None:
        cache_dir = default_cache_dir()

    if _enabled_dir is not None:
        return _enabled_dir

    try:
        import jax
        os.makedirs(cache_dir, exist_ok=True)
        jax.config.update('jax_compilation_cache_dir', cache_dir)
        # cache every executable including trivial ops: through the remote
        # compile relay even a jit_subtract costs ~0.4 s to compile
        # (measured), and a cold fit dispatches dozens of such tiny
        # programs — a >=1s threshold left ~half the cold start uncached
        jax.config.update('jax_persistent_cache_min_entry_size_bytes', -1)
        jax.config.update('jax_persistent_cache_min_compile_time_secs', 0.0)
    except Exception as exc:  # cache is an optimization, never fatal
        logger.warning('persistent compilation cache unavailable: %s', exc)
        return None

    _enabled_dir = cache_dir
    logger.info('persistent compilation cache at %s', cache_dir)
    return cache_dir
