"""Statics store semantics: dedup, bind scoping, inline threshold."""

import numpy as np
import jax
import jax.numpy as jnp

from vega_tpu.statics import (
    INLINE_THRESHOLD, StaticRef, StaticStore, is_identity)


def test_small_arrays_stay_inline():
    store = StaticStore()
    small = np.ones(10)
    assert store.register(small) is small


def test_content_dedup():
    store = StaticStore()
    a = np.random.default_rng(0).normal(size=(200, 200))
    ref1 = store.register(a.copy())
    ref2 = store.register(a.copy())
    assert isinstance(ref1, StaticRef)
    assert ref1.name == ref2.name
    assert len(store._arrays) == 1


def test_bind_scoping():
    store = StaticStore()
    a = np.arange(INLINE_THRESHOLD, dtype=float)
    ref = store.register(a)
    # unbound: host array
    np.testing.assert_array_equal(store.lookup(ref), a)
    # bound: the provided (e.g. traced) value
    with store.bind({ref.name: a * 2}):
        np.testing.assert_array_equal(store.lookup(ref), a * 2)
    np.testing.assert_array_equal(store.lookup(ref), a)


def test_bind_under_jit():
    store = StaticStore()
    a = np.arange(INLINE_THRESHOLD, dtype=float)
    ref = store.register(a)

    def fn(tree, x):
        with store.bind(tree):
            return (store.lookup(ref) * x).sum()

    out = jax.jit(fn)(store.device_tree(), 2.0)
    assert float(out) == float(a.sum() * 2)


def test_is_identity():
    assert is_identity(np.eye(5))
    assert not is_identity(np.eye(5) * 1.0000001)
    assert not is_identity(np.ones((5, 5)))
    assert not is_identity(np.eye(5)[:, :4])
