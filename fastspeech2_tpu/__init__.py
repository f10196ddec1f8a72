"""fastspeech2_tpu: a TPU-native FastSpeech 2 text-to-speech framework.

Built on JAX/XLA/Pallas with static shapes throughout, pjit/mesh sharding for
multi-chip scale, and a pure-Python text frontend compatible with
ming024/FastSpeech2 phone-ID sequences and config schema.
"""

__version__ = "0.1.0"


def _enable_persistent_compile_cache():
    """Cache compiled XLA executables across processes.

    Every CLI in this repo is a fresh process; without this, identical
    train/infer graphs recompile each launch (the vocoder GAN scan step
    alone costs minutes).  Opt out with FS2_TPU_NO_COMPILE_CACHE=1.
    Failures are non-fatal: backends that cannot serialize executables
    just run uncached, as before.
    """
    import os

    if os.environ.get("FS2_TPU_NO_COMPILE_CACHE"):
        return
    try:
        import jax

        cache_dir = os.environ.get(
            "JAX_COMPILATION_CACHE_DIR",
            os.path.join(os.path.expanduser("~"), ".cache",
                         "fastspeech2_tpu_xla"))
        os.makedirs(cache_dir, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    except Exception:  # pragma: no cover - cache is best-effort
        pass


_enable_persistent_compile_cache()
