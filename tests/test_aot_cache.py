"""AOT executable store (codeps_tpu/io/aot_cache.py).

The store exists because the axon relay backend defeats jax's
persistent compilation cache (round-5 measurement: 221.6 s cold vs
1246.2 s "warm" for the adapt step); warm process starts deserialize a
compiled executable instead. These tests pin the store's contract on
the CPU backend: hit/miss keying, value equality through the
round-trip, donation preservation, corrupt-entry recovery, and
tag/version invalidation.
"""

import jax
import jax.numpy as jnp
import pytest

from codeps_tpu.io.aot_cache import code_version, load_or_compile


@pytest.fixture()
def store(tmp_path):
    return tmp_path / "aot"


def test_miss_then_hit_same_values(store):
    f = jax.jit(lambda x: (x @ x.T).sum())
    x = jnp.arange(12.0).reshape(3, 4)
    info = {}
    c1 = load_or_compile(f, (x,), "t@3x4", cache_dir=store, info=info)
    assert info["aot"] == "miss" and info["seconds"] >= 0
    v1 = float(c1(x))
    info2 = {}
    c2 = load_or_compile(f, (x,), "t@3x4", cache_dir=store, info=info2)
    assert info2["aot"] == "hit"
    assert float(c2(x)) == v1
    assert len(list(store.glob("*.aotexec"))) == 1


def test_tag_partitions_keys(store):
    f = jax.jit(lambda x: x * 2)
    x = jnp.ones((4,))
    info = {}
    load_or_compile(f, (x,), "a", cache_dir=store, info=info)
    info2 = {}
    load_or_compile(f, (x,), "b", cache_dir=store, info=info2)
    assert info["aot"] == "miss" and info2["aot"] == "miss"
    assert info["key"] != info2["key"]


def test_corrupt_entry_recovers(store):
    f = jax.jit(lambda x: x + 3.0)
    x = jnp.zeros((5,))
    load_or_compile(f, (x,), "c", cache_dir=store)
    (entry,) = store.glob("*.aotexec")
    entry.write_bytes(b"not a pickle")
    info = {}
    c = load_or_compile(f, (x,), "c", cache_dir=store, info=info)
    assert info["aot"] == "miss"  # corrupt entry dropped, recompiled
    assert float(c(x)[0]) == 3.0


def test_donation_survives_roundtrip(store):
    g = jax.jit(lambda x: x + 1.0, donate_argnums=0)
    x = jnp.ones((8,))
    cg = load_or_compile(g, (x,), "don@8", cache_dir=store)
    y = cg(x)
    assert float(y[0]) == 2.0 and x.is_deleted()
    info = {}
    cg2 = load_or_compile(g, (jnp.ones((8,)),), "don@8",
                          cache_dir=store, info=info)
    assert info["aot"] == "hit"
    x2 = jnp.ones((8,))
    assert float(cg2(x2)[0]) == 2.0 and x2.is_deleted()


def test_pytree_args_and_outputs(store):
    f = jax.jit(lambda d: {"s": d["a"] + d["b"], "p": d["a"] * d["b"]})
    args = ({"a": jnp.full((2, 2), 3.0), "b": jnp.full((2, 2), 4.0)},)
    c = load_or_compile(f, args, "tree", cache_dir=store)
    out = c(*args)
    assert float(out["s"][0, 0]) == 7.0 and float(out["p"][0, 0]) == 12.0
    info = {}
    c2 = load_or_compile(f, args, "tree", cache_dir=store, info=info)
    assert info["aot"] == "hit"
    out2 = c2(*args)
    assert float(out2["s"][1, 1]) == 7.0


def test_sharded_executable_roundtrip(store):
    """An 8-device pjit executable reloads onto ITS device assignment."""
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

    mesh = Mesh(jax.devices(), ("data",))
    sharding = NamedSharding(mesh, P("data"))
    f = jax.jit(lambda x: (x * 2).sum(axis=1),
                in_shardings=sharding, out_shardings=sharding)
    x = jax.device_put(jnp.arange(32.0).reshape(8, 4), sharding)
    c1 = load_or_compile(f, (x,), "mesh@8x4", cache_dir=store)
    expect = [float(v) for v in c1(x)]
    info = {}
    c2 = load_or_compile(f, (x,), "mesh@8x4", cache_dir=store, info=info)
    assert info["aot"] == "hit"
    got = [float(v) for v in c2(x)]
    assert got == expect


def test_code_version_stable_and_versioned():
    v = code_version()
    assert v == code_version()
    assert v != "unversioned" and len(v) == 16
