"""Multi-device sharding on the virtual 8-device CPU mesh."""

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest
from jax.sharding import NamedSharding, PartitionSpec as P

from owlvit_tpu.models import get_config, owlvit
from owlvit_tpu.ops import losses as loss_ops
from owlvit_tpu.ops.preprocess import normalize_image
from owlvit_tpu.parallel import create_mesh, param_specs, shard_batch, shard_params, shard_state
from owlvit_tpu.train.state import TrainState, combine_params, partition_params


def test_mesh_shapes():
    m = create_mesh()
    assert m.devices.shape == (8, 1)
    m2 = create_mesh(data=4, model=2)
    assert m2.devices.shape == (4, 2)
    with pytest.raises(ValueError):
        create_mesh(data=3, model=2)


def test_param_specs_tp_rules():
    cfg = get_config("tiny")
    params = owlvit.init(jax.random.PRNGKey(0), cfg, num_queries=6)
    specs = param_specs(params)
    assert specs["vision"]["layers"]["attn"]["q"]["kernel"] == P(None, None, "model")
    assert specs["vision"]["layers"]["attn"]["out"]["kernel"] == P(None, "model", None)
    assert specs["vision"]["layers"]["mlp"]["fc1"]["kernel"] == P(None, None, "model")
    assert specs["vision"]["layers"]["mlp"]["fc2"]["kernel"] == P(None, "model", None)
    assert specs["queries"] == P()
    assert specs["box_head"]["dense0"]["kernel"] == P()


def test_dp_tp_forward_matches_single_device(rng):
    """The sharded forward must be numerically equal to the unsharded one."""
    cfg = get_config("tiny")
    params = owlvit.init(jax.random.PRNGKey(1), cfg, num_queries=6)
    img = rng.normal(size=(8, cfg.vision.image_size, cfg.vision.image_size, 3)).astype(
        np.float32
    )

    ref_boxes, ref_sims = owlvit.forward_train(params, cfg, jnp.asarray(img))

    mesh = create_mesh(data=4, model=2)
    with mesh:
        p = shard_params(params, mesh)
        x = jax.device_put(jnp.asarray(img), NamedSharding(mesh, P("data")))
        f = jax.jit(lambda p, x: owlvit.forward_train(p, cfg, x))
        boxes, sims = f(p, x)
    np.testing.assert_allclose(np.asarray(boxes), np.asarray(ref_boxes), rtol=2e-5, atol=2e-6)
    np.testing.assert_allclose(np.asarray(sims), np.asarray(ref_sims), rtol=2e-5, atol=2e-6)


def test_full_train_step_on_mesh(rng):
    """One dp x tp train step end-to-end (what dryrun_multichip exercises)."""
    mesh = create_mesh(data=4, model=2)
    cfg = get_config("tiny").replace(trainable_last_k=1)
    n_classes = 4
    params = owlvit.init(jax.random.PRNGKey(0), cfg, num_queries=12)
    trainable, frozen = partition_params(params, 1)
    tx = optax.adamw(1e-4)
    state = TrainState(trainable, frozen, tx.init(trainable), jnp.int32(0))
    state = shard_state(state, mesh)

    B, G, S = 8, 4, cfg.vision.image_size
    batch = shard_batch(
        {
            "image": rng.integers(0, 255, size=(B, S, S, 3)).astype(np.uint8),
            "boxes": np.tile(np.asarray([[0.1, 0.1, 0.5, 0.5]], np.float32), (B, G, 1)),
            "labels": np.zeros((B, G), np.int32),
            "gt_mask": np.tile(np.asarray([True, True, False, False]), (B, 1)),
        },
        mesh,
    )

    def train_step(state, batch):
        def loss_fn(tr):
            p = combine_params(tr, state.frozen)
            boxes, sims = owlvit.forward_train(p, cfg, normalize_image(batch["image"]))
            terms = loss_ops.push_pull_loss(
                sims, boxes, batch["labels"], batch["boxes"], batch["gt_mask"], n_classes
            )
            return loss_ops.total_loss(terms), terms

        (loss, _), grads = jax.value_and_grad(loss_fn, has_aux=True)(state.trainable)
        updates, opt = tx.update(grads, state.opt_state, state.trainable)
        return (
            TrainState(
                optax.apply_updates(state.trainable, updates),
                state.frozen, opt, state.step + 1,
            ),
            loss,
        )

    with mesh:
        new_state, loss = jax.jit(train_step)(state, batch)
    assert np.isfinite(float(loss))
    assert int(new_state.step) == 1
    # params actually changed
    a = jax.tree_util.tree_leaves(state.trainable)[0]
    b = jax.tree_util.tree_leaves(new_state.trainable)[0]
    assert not np.array_equal(np.asarray(a), np.asarray(b))


@pytest.mark.parametrize("n", [1, 2, 4, 8])
def test_dryrun_multichip_device_counts(n):
    """__graft_entry__.dryrun_multichip must work for any divisor count the
    driver passes (subset of the 8 virtual CPU devices)."""
    import importlib.util

    spec = importlib.util.spec_from_file_location(
        "graft_entry", "__graft_entry__.py"
    )
    graft = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(graft)
    graft.dryrun_multichip(n)
