"""LR schedule + optimizer grouping tests (reference tests cover scheduler
values implicitly through test_engine)."""

import jax.numpy as jnp
import numpy as np

from detectron2_centernet_tpu.config import get_cfg
from detectron2_centernet_tpu.solver import (
    build_lr_scheduler,
    build_optimizer,
    param_group_labels,
    warmup_cosine_lr,
    warmup_multistep_lr,
)


def test_warmup_multistep_values():
    sched = warmup_multistep_lr(
        1.0, steps=[10, 20], gamma=0.1, warmup_factor=0.5, warmup_iters=4, warmup_method="linear"
    )
    # linear warmup from 0.5 to 1.0 over 4 iters
    np.testing.assert_allclose(float(sched(0)), 0.5)
    np.testing.assert_allclose(float(sched(2)), 0.75)
    np.testing.assert_allclose(float(sched(4)), 1.0)
    np.testing.assert_allclose(float(sched(9)), 1.0)
    np.testing.assert_allclose(float(sched(10)), 0.1, rtol=1e-6)
    np.testing.assert_allclose(float(sched(25)), 0.01, rtol=1e-6)


def test_warmup_cosine_endpoints():
    sched = warmup_cosine_lr(2.0, max_iters=100, warmup_iters=0)
    np.testing.assert_allclose(float(sched(0)), 2.0)
    np.testing.assert_allclose(float(sched(50)), 1.0, atol=1e-6)
    np.testing.assert_allclose(float(sched(100)), 0.0, atol=1e-6)


def test_param_group_labels():
    params = {
        "conv": {"kernel": jnp.zeros((3, 3, 4, 4)), "bias": jnp.zeros(4)},
        "bn": {"scale": jnp.ones(4), "bias": jnp.zeros(4)},
        "block": {"norm": {"scale": jnp.ones(4)}},
    }
    labels = param_group_labels(params)
    assert labels["conv"]["kernel"] == "default"
    assert labels["conv"]["bias"] == "bias"
    assert labels["bn"]["scale"] == "norm"
    assert labels["bn"]["bias"] == "norm"
    assert labels["block"]["norm"]["scale"] == "norm"


def test_build_optimizer_steps():
    cfg = get_cfg()
    cfg.SOLVER.BASE_LR = 0.1
    cfg.SOLVER.WARMUP_ITERS = 0
    cfg.SOLVER.MOMENTUM = 0.0
    cfg.SOLVER.WEIGHT_DECAY = 0.0
    cfg.SOLVER.WEIGHT_DECAY_BIAS = 0.0
    params = {"conv": {"kernel": jnp.ones((2, 2)), "bias": jnp.ones(2)}}
    tx = build_optimizer(cfg, params)
    state = tx.init(params)
    grads = {"conv": {"kernel": jnp.ones((2, 2)), "bias": jnp.ones(2)}}
    updates, _ = tx.update(grads, state, params)
    np.testing.assert_allclose(np.asarray(updates["conv"]["kernel"]), -0.1, rtol=1e-6)
    np.testing.assert_allclose(np.asarray(updates["conv"]["bias"]), -0.1, rtol=1e-6)


def test_build_optimizer_adam():
    """SOLVER.OPTIMIZER=ADAM: first step moves by ~lr per coordinate (Adam
    normalizes the gradient), bias group scaled by BIAS_LR_FACTOR."""
    cfg = get_cfg()
    cfg.SOLVER.OPTIMIZER = "ADAM"
    cfg.SOLVER.BASE_LR = 0.01
    cfg.SOLVER.WARMUP_ITERS = 0
    cfg.SOLVER.WEIGHT_DECAY = 0.0
    cfg.SOLVER.WEIGHT_DECAY_BIAS = 0.0
    cfg.SOLVER.BIAS_LR_FACTOR = 2.0
    params = {"conv": {"kernel": jnp.ones((2, 2)), "bias": jnp.ones(2)}}
    tx = build_optimizer(cfg, params)
    state = tx.init(params)
    grads = {"conv": {"kernel": jnp.full((2, 2), 3.0), "bias": jnp.full(2, 3.0)}}
    updates, _ = tx.update(grads, state, params)
    # adam step 0: -lr * m_hat / (sqrt(v_hat) + eps) = -lr * sign(g)
    np.testing.assert_allclose(np.asarray(updates["conv"]["kernel"]), -0.01, rtol=1e-4)
    np.testing.assert_allclose(np.asarray(updates["conv"]["bias"]), -0.02, rtol=1e-4)


def test_warmup_poly_lr():
    """WarmupPolyLR (reference projects/DeepLab lr_scheduler.py): poly decay
    after warmup, optional constant tail."""
    import pytest

    from detectron2_centernet_tpu.solver.lr_scheduler import warmup_poly_lr

    s = warmup_poly_lr(0.1, 1000, power=0.9, warmup_iters=10, warmup_factor=0.1)
    assert float(s(0)) == pytest.approx(0.01, rel=1e-5)  # warmup start
    assert float(s(500)) == pytest.approx(0.1 * 0.5**0.9, rel=1e-5)
    assert float(s(1000)) == pytest.approx(0.0, abs=1e-7)
    s2 = warmup_poly_lr(0.1, 1000, power=0.9, warmup_iters=0, constant_ending=0.05)
    assert float(s2(999)) == pytest.approx(0.1 * 0.05, rel=1e-5)  # tail clamp


def test_sem_seg_hard_pixel_mining():
    """DeepLabCE (reference projects/DeepLab loss.py:6-40): with top-k=0.5
    the mean runs over the hardest half only, so it exceeds the plain CE."""
    import jax.numpy as jnp
    from detectron2_centernet_tpu.models.meta_arch.semantic_seg import sem_seg_loss

    rng = np.random.RandomState(0)
    logits = jnp.asarray(rng.randn(1, 8, 8, 4), jnp.float32)
    targets = jnp.asarray(rng.randint(0, 4, (1, 8, 8)), jnp.int32)
    plain = float(sem_seg_loss(logits, targets))
    mined = float(sem_seg_loss(logits, targets, top_k_percent=0.5))
    assert mined > plain
