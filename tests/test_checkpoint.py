"""Checkpointer save/resume round trip + torch-weight alignment."""

import os

import numpy as np
import jax.numpy as jnp

from detectron2_centernet_tpu.checkpoint import (
    Checkpointer,
    PeriodicCheckpointer,
    align_state_dicts,
    convert_torch_tensor,
)


def _state():
    return {
        "params": {"conv": {"kernel": np.ones((3, 3, 2, 4), np.float32)}},
        "step": np.int32(5),
    }


def test_save_load_round_trip(tmp_path):
    state = _state()
    ckpt = Checkpointer(state, str(tmp_path))
    ckpt.save("model_0000005")
    assert ckpt.has_checkpoint()
    assert ckpt.get_checkpoint_file().endswith("model_0000005")

    fresh = {
        "params": {"conv": {"kernel": np.zeros((3, 3, 2, 4), np.float32)}},
        "step": np.int32(0),
    }
    ckpt2 = Checkpointer(fresh, str(tmp_path))
    restored = ckpt2.resume_or_load("", resume=True)
    np.testing.assert_array_equal(restored["params"]["conv"]["kernel"], 1.0)
    assert int(restored["step"]) == 5


def test_resume_or_load_without_checkpoint(tmp_path):
    state = _state()
    ckpt = Checkpointer(state, str(tmp_path))
    out = ckpt.resume_or_load("", resume=True)  # nothing on disk -> identity
    assert out is state


def test_periodic_checkpointer(tmp_path):
    state = _state()
    ckpt = Checkpointer(state, str(tmp_path))
    pc = PeriodicCheckpointer(ckpt, period=3, max_iter=7)
    for it in range(7):
        pc.step(it)
    files = sorted(os.path.basename(f) for f in ckpt.get_all_checkpoint_files())
    assert "model_0000002" in files and "model_0000005" in files
    assert "model_final" in files


def test_convert_torch_tensor_layouts():
    conv = np.arange(2 * 3 * 5 * 7).reshape(2, 3, 5, 7).astype(np.float32)  # OIHW
    out = convert_torch_tensor("backbone.conv.weight", conv)
    assert out.shape == (5, 7, 3, 2)  # HWIO
    lin = np.arange(6).reshape(2, 3).astype(np.float32)
    assert convert_torch_tensor("fc.weight", lin).shape == (3, 2)


def test_align_state_dicts_by_shape_and_name():
    torch_sd = {
        "backbone.level0.conv.weight": np.ones((4, 2, 3, 3), np.float32),
        "backbone.level0.bn.weight": np.full((4,), 2.0, np.float32),
        "backbone.level0.bn.bias": np.full((4,), 3.0, np.float32),
        "backbone.level0.bn.num_batches_tracked": np.int64(7),
    }
    flax_tree = {
        "level0": {
            "conv": {"kernel": np.zeros((3, 3, 2, 4), np.float32)},
            "bn": {"scale": np.zeros((4,), np.float32), "bias": np.zeros((4,), np.float32)},
        }
    }
    import jax

    leaves = [
        ("/".join(str(p.key) for p in path), np.asarray(leaf))
        for path, leaf in jax.tree_util.tree_flatten_with_path(flax_tree)[0]
    ]
    aligned = align_state_dicts(torch_sd, leaves)
    assert aligned["level0/conv/kernel"].shape == (3, 3, 2, 4)
    # bias/scale disambiguated by name tokens
    np.testing.assert_array_equal(aligned["level0/bn/bias"], 3.0)
    np.testing.assert_array_equal(aligned["level0/bn/scale"], 2.0)


def test_align_skips_pairs_with_no_name_similarity():
    """Same-shaped but entirely unrelated names must stay unmatched (the
    reference align_and_update_state_dicts warns instead of mis-wiring)."""
    torch_sd = {"foo.alpha.gamma": np.full((4, 4), 5.0, np.float32)}
    leaves = [("head/cls/kernel", np.zeros((4, 4), np.float32))]
    aligned = align_state_dicts(torch_sd, leaves)
    assert "head/cls/kernel" not in aligned
