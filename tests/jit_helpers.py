"""Jitted init/apply helpers for tests.

On this 1-CPU host an eager ``model.init`` dispatches hundreds of sub-second
per-parameter initializer compiles, none of which clear the persistent
compile cache's 1.0 s threshold (conftest.py) — a tiny Swin init measured
135 s eager vs 36 s as one jitted program cold and 3.7 s warm.  Fusing
init+apply into a single jitted call turns every warm suite run into one
cache hit per test.  (Lowering the cache threshold to 0 s instead makes
eager paths *slower* — each tiny op then pays AOT serialize/load overhead.)
"""

import jax


def run_init_apply(model, *args, seed=0, **apply_kw):
    """init + apply as ONE jitted, persistently-cached program.

    Use when the test only needs the module outputs, not the variables.
    """

    @jax.jit
    def run(key, *a):
        variables = model.init(key, *a)
        return model.apply(variables, *a, **apply_kw)

    return run(jax.random.key(seed), *args)


def jit_init(model, *args, seed=0, static=(), **kw):
    """Jitted (and therefore persistently cached) ``model.init``.

    ``static``: trailing positional args that must stay Python values
    (bools/shape tuples used in control flow), appended after ``args``.
    """
    return jax.jit(lambda key, *a: model.init(key, *a, *static, **kw))(
        jax.random.key(seed), *args)


def jit_apply(model, variables, *args, static=(), **kw):
    """Jitted ``model.apply`` for tests that overwrite variables first."""
    return jax.jit(lambda v, *a: model.apply(v, *a, *static, **kw))(
        variables, *args)
