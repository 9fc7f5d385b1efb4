"""Train state and parameter partitioning (freeze sets).

The reference freezes everything except {vision layers.11, box*,
*post_layernorm*, class_predictor, queries} (/root/reference/src/models.py:
173-184) and its AdamW therefore neither updates nor weight-decays the
frozen set. We reproduce that exactly by PARTITIONING the param pytree into
(trainable, frozen): the optimizer sees only the trainable subtree, and the
frozen backbone prefix additionally runs under stop_gradient in the forward
(vit.forward trainable_last_k) so its backward is never built.

With lax.scan-stacked encoder layers the freeze boundary cuts through a
single leaf: the stacked [L, ...] arrays split at L - k along axis 0.
"""

from __future__ import annotations

from typing import Any, NamedTuple

import jax
import jax.numpy as jnp


class TrainState(NamedTuple):
    trainable: Any  # params subtree the optimizer updates
    frozen: Any  # params subtree held constant
    opt_state: Any
    step: jnp.ndarray  # scalar int32


def partition_params(params: dict, trainable_last_k: int = 1) -> tuple[dict, dict]:
    """Split detector params into (trainable, frozen).

    Trainable (reference freeze-set complement): last k vision encoder
    layers, vision post_ln, merged_ln, box_head, class_head.dense0, queries.
    Frozen: everything else (incl. the text tower, absent from the
    reference's fine-tuned module entirely, and class_head logit_shift/scale
    which its patched head drops, models.py:15-38).
    """
    v = params["vision"]
    layers = v["layers"]
    n_layers = jax.tree_util.tree_leaves(layers)[0].shape[0]
    # None = full fine-tune: every encoder layer trainable (embeddings and
    # pre_ln stay frozen — they are not in the reference's trainable set for
    # any k). Mirrors vit.forward, where None disables the stop_gradient split.
    k = n_layers if trainable_last_k is None else trainable_last_k
    if not 0 <= k <= n_layers:
        raise ValueError(
            f"trainable_last_k={trainable_last_k} out of range [0, {n_layers}]"
        )
    trainable = {
        "vision": {
            "layers_tail": jax.tree.map(lambda a: a[a.shape[0] - k :], layers),
            "post_ln": v["post_ln"],
        },
        "merged_ln": params["merged_ln"],
        "box_head": params["box_head"],
        "class_head": {"dense0": params["class_head"]["dense0"]},
    }
    if "queries" in params:
        trainable["queries"] = params["queries"]

    frozen = {
        "vision": {
            "patch_embedding": v["patch_embedding"],
            "class_embedding": v["class_embedding"],
            "position_embedding": v["position_embedding"],
            "pre_ln": v["pre_ln"],
            "layers_head": jax.tree.map(lambda a: a[: a.shape[0] - k], layers),
        },
        "class_head": {
            "logit_shift": params["class_head"]["logit_shift"],
            "logit_scale": params["class_head"]["logit_scale"],
        },
    }
    if "text" in params:
        frozen["text"] = params["text"]
    return trainable, frozen


def combine_params(trainable: dict, frozen: dict) -> dict:
    """Inverse of partition_params: rebuild the full detector pytree."""
    layers = jax.tree.map(
        lambda h, t: jnp.concatenate([h, t], axis=0),
        frozen["vision"]["layers_head"],
        trainable["vision"]["layers_tail"],
    )
    params = {
        "vision": {
            "patch_embedding": frozen["vision"]["patch_embedding"],
            "class_embedding": frozen["vision"]["class_embedding"],
            "position_embedding": frozen["vision"]["position_embedding"],
            "pre_ln": frozen["vision"]["pre_ln"],
            "layers": layers,
            "post_ln": trainable["vision"]["post_ln"],
        },
        "merged_ln": trainable["merged_ln"],
        "box_head": trainable["box_head"],
        "class_head": {
            "dense0": trainable["class_head"]["dense0"],
            "logit_shift": frozen["class_head"]["logit_shift"],
            "logit_scale": frozen["class_head"]["logit_scale"],
        },
    }
    if "queries" in trainable:
        params["queries"] = trainable["queries"]
    if "text" in frozen:
        params["text"] = frozen["text"]
    return params
