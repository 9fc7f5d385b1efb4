"""Trainer-level GSPMD mesh training (training.mesh_data / mesh_model).

The reference has no parallelism at all (SURVEY §2.3); here multi-device
training is a config knob. These run on the virtual 8-device CPU mesh and
pin: numerical agreement with the single-device trainer, tensor-parallel
execution, sharding placement of the state, cache interplay, and the
validation errors.
"""

import os

import jax
import numpy as np
import pytest

from owlvit_tpu.train import Trainer
from owlvit_tpu.utils.config import Config, DataConfig, ModelConfig, TrainingConfig

pytestmark = pytest.mark.skipif(
    len(jax.devices()) < 4, reason="needs the virtual CPU mesh"
)


def _cfg(root, n_train=8, **training_kw):
    return Config(
        data=DataConfig(
            synthetic_root=os.path.join(root, "synth"),
            num_train_images=n_train,
            num_test_images=4,
            max_gt=8,
            synthetic_classes=3,
        ),
        training=TrainingConfig(
            **{
                "n_epochs": 2, "learning_rate": 1e-4, "batch_size": 4,
                "log_file": None, "top_k": 16, **training_kw,
            }
        ),
        model=ModelConfig(name="tiny", trainable_last_k=1),
    )


def _queries(t):
    return np.asarray(
        jax.device_get(t.state.trainable["queries"]), np.float32
    )


def test_dp_matches_single_device(tmp_path):
    t1 = Trainer(_cfg(str(tmp_path / "single")), workdir=str(tmp_path / "single"))
    m1 = t1.run()
    t4 = Trainer(
        _cfg(str(tmp_path / "dp4"), mesh_data=4), workdir=str(tmp_path / "dp4")
    )
    m4 = t4.run()
    assert int(t1.state.step) == int(t4.state.step) == 4
    np.testing.assert_allclose(_queries(t1), _queries(t4), rtol=1e-4, atol=1e-6)
    assert np.isclose(m1["map"], m4["map"], atol=1e-6)


def test_dp_x_tp_runs_and_shards_params(tmp_path):
    t = Trainer(
        _cfg(str(tmp_path), mesh_data=2, mesh_model=2), workdir=str(tmp_path)
    )
    metrics = t.run()
    assert np.isfinite(metrics["map"])
    # Megatron specs actually applied: qkv kernels sharded on "model"
    spec = t.state.trainable["vision"]["layers_tail"]["attn"]["q"]["kernel"].sharding.spec
    assert "model" in spec
    # frozen stack too
    spec_f = t.state.frozen["vision"]["layers_head"]["attn"]["q"]["kernel"].sharding.spec
    assert "model" in spec_f


def test_mesh_device_store_sharded_pool(tmp_path):
    """8 images divide by mesh_data=4 -> sharded device pool, aligned
    sampler, rank-local gathers; numerics match the uncached mesh run."""
    t = Trainer(
        _cfg(str(tmp_path / "c"), mesh_data=4, cache_backbone=True),
        workdir=str(tmp_path / "c"),
    )
    assert t.act_store == "device" and t.act_cache is None
    metrics = t.run()
    assert np.isfinite(metrics["map"])
    assert t._acts_filled.all()
    assert t._acts_dev.sharding.spec[0] == "data"  # pool rows stay sharded

    t0 = Trainer(
        _cfg(str(tmp_path / "p"), mesh_data=4), workdir=str(tmp_path / "p")
    )
    t0.run()
    # same data and lr; batch COMPOSITION differs (aligned sampler), so
    # compare loosely: both trained, finite, same step count
    assert int(t0.state.step) == int(t.state.step) == 4
    assert np.all(np.isfinite(_queries(t)))


def test_mesh_device_store_int8_pool(tmp_path):
    """cache_store_dtype=int8 composes with the dp-sharded pool: both
    leaves ({q, s}) shard their rows on "data" and training stays finite."""
    t = Trainer(
        _cfg(str(tmp_path), mesh_data=4, cache_backbone=True,
             cache_store_dtype="int8"),
        workdir=str(tmp_path),
    )
    metrics = t.run()
    assert t.act_store == "device"
    assert isinstance(t._acts_dev, dict)
    assert t._acts_dev["q"].sharding.spec[0] == "data"
    assert t._acts_dev["s"].sharding.spec[0] == "data"
    assert t._acts_filled.all()
    assert np.isfinite(metrics["map"])
    assert np.all(np.isfinite(_queries(t)))


def test_mesh_indivisible_set_falls_back_to_disk(tmp_path):
    t = Trainer(
        _cfg(str(tmp_path), n_train=10, mesh_data=4, cache_backbone=True,
             batch_size=4),
        workdir=str(tmp_path),
    )
    assert t.act_store == "disk" and t.act_cache is not None
    metrics = t.run()
    assert np.isfinite(metrics["map"])


def test_batch_not_divisible_rejected(tmp_path):
    with pytest.raises(ValueError, match="mesh_data"):
        Trainer(
            _cfg(str(tmp_path), mesh_data=3, batch_size=4),
            workdir=str(tmp_path),
        )


def test_too_many_devices_rejected(tmp_path):
    with pytest.raises(ValueError, match="devices"):
        Trainer(_cfg(str(tmp_path), mesh_data=64), workdir=str(tmp_path))


def test_dp_x_augment_matches_single_device(tmp_path):
    """On-device augmentation composes with GSPMD dp: the augmented dp4 run
    reproduces the augmented single-device run exactly (fold_in(step) keys
    are data-position-independent, so sharding cannot change the pixels)."""
    kw = dict(augment=True, aug_hflip=0.5, aug_color=0.3,
              aug_scale_min=0.9, aug_scale_max=1.1)
    t1 = Trainer(
        _cfg(str(tmp_path / "aug1"), **kw), workdir=str(tmp_path / "aug1")
    )
    m1 = t1.run()
    t4 = Trainer(
        _cfg(str(tmp_path / "aug4"), mesh_data=4, **kw),
        workdir=str(tmp_path / "aug4"),
    )
    m4 = t4.run()
    assert int(t1.state.step) == int(t4.state.step) == 4
    np.testing.assert_allclose(_queries(t1), _queries(t4), rtol=1e-4, atol=1e-6)
    assert np.isclose(m1["map"], m4["map"], atol=1e-6)


def test_mesh_staged_pixels_matches_streamed(tmp_path):
    """stage_pixels=on under dp4: pixel/GT pools row-shard on "data", the
    aligned sampler keeps gathers rank-local, and the trajectory matches
    the STREAMED dp4 cached run exactly (same shard-aligned batch order)."""
    t_off = Trainer(
        _cfg(str(tmp_path / "off"), mesh_data=4, cache_backbone=True,
             stage_pixels="off", log_file="m.jsonl"),
        workdir=str(tmp_path / "off"),
    )
    m_off = t_off.run()
    t_on = Trainer(
        _cfg(str(tmp_path / "on"), mesh_data=4, cache_backbone=True,
             stage_pixels="on", log_file="m.jsonl"),
        workdir=str(tmp_path / "on"),
    )
    assert t_on._stage_on
    m_on = t_on.run()
    # image pool freed after the fill epoch; GT pools stay for the
    # device-epoch gathers
    assert "image" not in t_on._pix_train and t_on._acts_filled.all()
    np.testing.assert_array_equal(_queries(t_off), _queries(t_on))
    assert float(m_off["map"]) == float(m_on["map"])

    import json

    for d in ("off", "on"):
        with open(str(tmp_path / d / "m.jsonl")) as f:
            rows = [json.loads(x) for x in f.read().strip().split("\n")]
        if d == "off":
            ref = rows
        else:
            for ra, rb in zip(ref, rows):
                for k in ra:
                    if k.startswith("train_"):
                        # device-epoch f32 term accumulation vs host f64
                        # sums: logged means agree to f32 eps (the queries
                        # assert above pins the training math exactly)
                        np.testing.assert_allclose(
                            ra[k], rb[k], rtol=2e-6, err_msg=k
                        )


def test_mesh_staged_uncached_matches_streamed(tmp_path):
    """stage_pixels=on, no cache, dp4: the full step trains from sharded
    pixel-pool gathers. Since r5g both samplers share ONE order condition
    (_shard_aligned_order: aligned only for the cached device act pool), so
    mesh+uncached staged uses the same plain shuffle as streamed — the two
    trajectories must be identical, not merely finite (and dp remains
    trajectory-identical to single-device, pinned elsewhere)."""
    t_on = Trainer(
        _cfg(str(tmp_path / "on"), mesh_data=4, stage_pixels="on"),
        workdir=str(tmp_path / "on"),
    )
    assert t_on._stage_on
    m_on = t_on.run()
    assert int(t_on.state.step) == 4
    assert np.isfinite(m_on["map"])
    assert t_on._pix_train["image"].sharding.spec[0] == "data"
    t_off = Trainer(
        _cfg(str(tmp_path / "off"), mesh_data=4, stage_pixels="off"),
        workdir=str(tmp_path / "off"),
    )
    assert not t_off._stage_on
    m_off = t_off.run()
    np.testing.assert_array_equal(_queries(t_off), _queries(t_on))
    assert float(m_off["map"]) == float(m_on["map"])
