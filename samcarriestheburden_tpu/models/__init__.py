"""Functional model cores: pure ``init(key) -> params`` / ``apply(params, x)``
pairs over pytree parameter dicts.  No module objects, no mutable state —
everything composes with jit/vmap/pjit/grad."""
