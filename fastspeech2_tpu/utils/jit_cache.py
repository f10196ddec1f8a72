"""Process-lifetime cache of jitted step/inference callables.

Re-creating a `jax.jit` closure on every `train()` / `evaluate()` /
`Synthesizer()` call forces a full re-trace of the model even when the
persistent compilation cache makes the XLA compile itself nearly free
(tracing a train step is seconds of single-core Python). Flax modules and
the config dataclasses hash by value, so equivalent callers can share one
jitted callable — repeated loops within one process (notably the test
suite, and any notebook/serving process that constructs pipelines more
than once) then reuse both the traces and the compiled executables.

Keys must capture everything the trace depends on: the module(s), config
dataclasses, and any static python values the builder closes over. Values
are never evicted; a process only ever holds a handful of step functions.
"""

_CACHE = {}


def cached_jit(key, builder):
    """Return the cached callable for `key`, building it on first use.

    `key` must be hashable and value-identify the traced computation;
    `builder` is a zero-arg callable returning the jitted function.
    """
    fn = _CACHE.get(key)
    if fn is None:
        fn = builder()
        _CACHE[key] = fn
    return fn


def cache_clear():
    _CACHE.clear()
