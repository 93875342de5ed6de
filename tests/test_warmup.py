"""Warmup manifest record/replay (stark/warmup.py).

The device prover's cold-start fix: program signatures recorded during a
prove are AOT-compiled by background threads in a later process, through
the SAME factory caches the prover dispatches through. These tests run
the whole loop on the CPU backend (record -> manifest on disk -> replay
-> compiled), plus spec round-trip edge cases.
"""

import json

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from lurk_tpu.stark import warmup as wu


@pytest.fixture()
def warm_env(tmp_path, monkeypatch):
    monkeypatch.setenv("LURK_TPU_WARM_DIR", str(tmp_path))
    monkeypatch.setattr(wu, "_MANIFEST_PATH", None)
    monkeypatch.setattr(wu, "_SEEN", set())
    monkeypatch.setattr(wu, "_STARTED", set())
    return tmp_path


def test_spec_roundtrip():
    x = jnp.zeros((3, 5), jnp.uint32)
    args = [x, 7, True, None, "s", (x, [x, 2]), {"k": x}]
    specs = [wu._spec(a) for a in args]
    # JSON round trip, as the manifest does
    specs = json.loads(json.dumps(specs))
    back = [wu._unspec(s) for s in specs]
    assert back[0] == jax.ShapeDtypeStruct((3, 5), np.dtype("uint32"))
    assert back[1:5] == [7, True, None, "s"]
    assert isinstance(back[5], tuple) and isinstance(back[5][1], list)
    assert back[5][1][1] == 2
    assert back[6]["k"] == back[0]


def test_record_and_replay_module_kernel(warm_env):
    fn = wu.wrap("t.add", None, jax.jit(lambda a, b: a + b))
    wu.activate("digest-a")
    x = jnp.ones((4, 4), jnp.uint32)
    np.testing.assert_array_equal(np.asarray(fn(x, x)), 2)
    entries = wu._load(wu.manifest_path("digest-a"))
    assert [e["site"] for e in entries] == ["t.add"]
    # second identical call records nothing new
    fn(x, x)
    assert len(wu._load(wu.manifest_path("digest-a"))) == 1
    # new shape records a second entry
    fn(x[:2], x[:2])
    assert len(wu._load(wu.manifest_path("digest-a"))) == 2
    # "another process": replay compiles both signatures through the
    # same WarmFn object
    run = wu.start("digest-a", threads=2)
    assert run is not None
    assert run.join(60)
    assert run.done == 2 and run.failed == 0


def test_replay_factory_site(warm_env):
    from lurk_tpu.stark import device_prover as dp
    wu.activate("digest-b")
    fn = dp._ext_powers_fn(5)
    z = jnp.zeros(4, jnp.uint32)
    fn(z)
    entries = wu._load(wu.manifest_path("digest-b"))
    assert entries and entries[0]["site"] == "extpow" \
        and entries[0]["key"] == 5
    run = wu.start("digest-b", threads=1)
    assert run is not None and run.join(60)
    assert run.done == 1 and run.failed == 0


def test_replay_static_args(warm_env):
    from lurk_tpu.lair import device_trace as dt
    wu.activate("digest-c")
    tr = dt._init_trace(8, 3, jnp.uint32(0))
    assert tr.shape == (8, 3)
    entries = wu._load(wu.manifest_path("digest-c"))
    assert entries and entries[0]["site"] == "dt.init"
    specs = entries[0]["args"]
    assert specs[0] == {"s": 8} and specs[1] == {"s": 3}
    run = wu.start("digest-c", threads=1)
    assert run is not None and run.join(60)
    assert run.done == 1 and run.failed == 0


def test_unknown_site_counts_failed(warm_env):
    wu.activate("digest-d")
    wu._record("no.such.site", None, (jnp.zeros(2, jnp.uint32),))
    run = wu.start("digest-d", threads=1)
    assert run is not None and run.join(60)
    assert run.failed == 1 and run.done == 0


def test_code_salt_invalidates(warm_env, monkeypatch):
    wu.activate("digest-e")
    wu._record("t.add2", None, (jnp.zeros(2, jnp.uint32),))
    assert wu._load(wu.manifest_path("digest-e"))
    monkeypatch.setattr(wu, "_SALT", "0" * 16)
    assert wu._load(wu.manifest_path("digest-e")) == []
