"""Pytree checkpoint IO: flattened npz payloads under .pth names."""

import numpy as np
import pytest

from abnet3_tpu.serialize import load_pytree, save_pytree


def test_roundtrip_nested_mixed(tmp_path):
    tree = {
        "params": {
            "layer_0": {"w": np.random.RandomState(0).randn(4, 3)
                        .astype(np.float32),
                        "b": np.zeros(3, np.float32)},
            "scalars": np.int32(7),
        },
        "stack": [np.arange(5), {"inner": np.float64(2.5)}],
        "empty_d": {},
        "empty_l": [],
    }
    path = str(tmp_path / "net.pth")
    save_pytree(path, tree, meta={"epoch": 3, "tag": "best"})
    loaded, meta = load_pytree(path)
    assert meta == {"epoch": 3, "tag": "best"}
    np.testing.assert_array_equal(loaded["params"]["layer_0"]["w"],
                                  tree["params"]["layer_0"]["w"])
    assert loaded["params"]["layer_0"]["w"].dtype == np.float32
    assert int(loaded["params"]["scalars"]) == 7
    np.testing.assert_array_equal(loaded["stack"][0], np.arange(5))
    assert float(loaded["stack"][1]["inner"]) == 2.5
    assert loaded["empty_d"] == {}
    assert loaded["empty_l"] == []


def test_no_pickle_execution(tmp_path):
    """.pth payloads are plain npz: loading never unpickles (a malicious
    torch-style pickle raises instead of executing)."""
    import pickle
    path = str(tmp_path / "evil.pth")
    with open(path, "wb") as fh:
        pickle.dump({"boom": 1}, fh)
    with pytest.raises(Exception):
        load_pytree(path)


def test_key_separator_collision_raises(tmp_path):
    """Keys the flat encoding cannot round-trip (separator, '#i' list
    markers, empty-container sentinels) raise at SAVE time instead of
    silently restructuring on load (previously {'a::b': x} re-nested
    to {'a': {'b': x}})."""
    path = str(tmp_path / "sep.pth")
    for bad in ("a::b", "#0", "__emptydict__", "__emptylist__"):
        with pytest.raises(ValueError, match="round-trip"):
            save_pytree(path, {bad: np.ones(2, np.float32)})
    # '#text' (not an index) stays legal
    save_pytree(path, {"#notanindex": np.zeros(2)})
    loaded, _ = load_pytree(path)
    assert np.array_equal(loaded["#notanindex"], np.zeros(2))


def test_save_is_atomic(tmp_path, monkeypatch):
    """A crash during the write leaves the previous checkpoint intact
    (temp-file + os.replace)."""
    path = str(tmp_path / "ckpt.pth")
    save_pytree(path, {"v": np.arange(3)})
    import builtins
    real_open = builtins.open

    class Boom(RuntimeError):
        pass

    def failing_open(f, mode="r", *a, **kw):
        if str(f).endswith(".tmp") and "w" in mode:
            raise Boom("disk full")
        return real_open(f, mode, *a, **kw)

    monkeypatch.setattr(builtins, "open", failing_open)
    with pytest.raises(Boom):
        save_pytree(path, {"v": np.arange(99)})
    monkeypatch.undo()
    loaded, _ = load_pytree(path)
    np.testing.assert_array_equal(loaded["v"], np.arange(3))
