"""HF OWL-ViT checkpoint -> owlvit_tpu pytree converter (offline tool).

torch / HF transformers are allowed here ONLY as an offline conversion step
(per the north star, the runtime is HF/PyTorch-free). Typical use:

    from transformers import OwlViTForObjectDetection
    m = OwlViTForObjectDetection.from_pretrained("google/owlvit-base-patch32")
    params = convert_state_dict({k: v.numpy() for k, v in m.state_dict().items()}, cfg)
    save_params("owlvit_b32.npz", params)

The runtime then calls load_params() — numpy only.

Key facts encoded here (checked against HF modeling_owlvit.py):
  * torch nn.Linear stores weight as [out, in]; we store [in, out]
  * the conv patch embedding [D, 3, ps, ps] flattens to [ps*ps*3, D] in
    (py, px, channel) order, matching vit.patchify
  * encoder layers are stacked along a leading axis for lax.scan
"""

from __future__ import annotations

import numpy as np


def _np(x) -> np.ndarray:
    if hasattr(x, "detach"):
        x = x.detach().cpu().numpy()
    return np.asarray(x, dtype=np.float32)


def _linear(sd: dict, prefix: str) -> dict:
    p = {"kernel": _np(sd[f"{prefix}.weight"]).T}
    if f"{prefix}.bias" in sd:
        p["bias"] = _np(sd[f"{prefix}.bias"])
    return p


def _ln(sd: dict, prefix: str) -> dict:
    return {"scale": _np(sd[f"{prefix}.weight"]), "bias": _np(sd[f"{prefix}.bias"])}


def _encoder(sd: dict, prefix: str, num_layers: int) -> dict:
    layers = []
    for i in range(num_layers):
        lp = f"{prefix}.layers.{i}"
        layers.append(
            {
                "ln1": _ln(sd, f"{lp}.layer_norm1"),
                "attn": {
                    "q": _linear(sd, f"{lp}.self_attn.q_proj"),
                    "k": _linear(sd, f"{lp}.self_attn.k_proj"),
                    "v": _linear(sd, f"{lp}.self_attn.v_proj"),
                    "out": _linear(sd, f"{lp}.self_attn.out_proj"),
                },
                "ln2": _ln(sd, f"{lp}.layer_norm2"),
                "mlp": {
                    "fc1": _linear(sd, f"{lp}.mlp.fc1"),
                    "fc2": _linear(sd, f"{lp}.mlp.fc2"),
                },
            }
        )
    import jax

    return jax.tree.map(lambda *xs: np.stack(xs), *layers)


def convert_state_dict(sd: dict, cfg) -> dict:
    """HF OwlViTForObjectDetection state_dict -> owlvit_tpu params pytree."""
    ps = cfg.vision.patch_size
    conv_w = _np(sd["owlvit.vision_model.embeddings.patch_embedding.weight"])
    # [D, 3, ps, ps] -> [ps, ps, 3, D] -> [ps*ps*3, D] in (py, px, c) order
    patch_kernel = conv_w.transpose(2, 3, 1, 0).reshape(ps * ps * 3, -1)

    params = {
        "vision": {
            "patch_embedding": {"kernel": patch_kernel},
            "class_embedding": _np(
                sd["owlvit.vision_model.embeddings.class_embedding"]
            ),
            "position_embedding": _np(
                sd["owlvit.vision_model.embeddings.position_embedding.weight"]
            ),
            "pre_ln": _ln(sd, "owlvit.vision_model.pre_layernorm"),
            "layers": _encoder(
                sd, "owlvit.vision_model.encoder", cfg.vision.num_layers
            ),
            "post_ln": _ln(sd, "owlvit.vision_model.post_layernorm"),
        },
        "text": {
            "token_embedding": _np(
                sd["owlvit.text_model.embeddings.token_embedding.weight"]
            ),
            "position_embedding": _np(
                sd["owlvit.text_model.embeddings.position_embedding.weight"]
            ),
            "layers": _encoder(sd, "owlvit.text_model.encoder", cfg.text.num_layers),
            "final_ln": _ln(sd, "owlvit.text_model.final_layer_norm"),
            "projection": {"kernel": _np(sd["owlvit.text_projection.weight"]).T},
        },
        "merged_ln": _ln(sd, "layer_norm"),
        "box_head": {
            "dense0": _linear(sd, "box_head.dense0"),
            "dense1": _linear(sd, "box_head.dense1"),
            "dense2": _linear(sd, "box_head.dense2"),
        },
        "class_head": {
            "dense0": _linear(sd, "class_head.dense0"),
            "logit_shift": _linear(sd, "class_head.logit_shift"),
            "logit_scale": _linear(sd, "class_head.logit_scale"),
        },
    }
    return params


# --------------------------------------------------------------------------
# Flat npz (de)serialization — HF/torch-free runtime loading
# --------------------------------------------------------------------------

_SEP = "/"


def flatten(tree: dict, prefix: str = "") -> dict:
    out = {}
    for k, v in tree.items():
        key = f"{prefix}{_SEP}{k}" if prefix else k
        if isinstance(v, dict):
            out.update(flatten(v, key))
        else:
            out[key] = np.asarray(v)
    return out


def unflatten(flat: dict) -> dict:
    tree: dict = {}
    for key, v in flat.items():
        parts = key.split(_SEP)
        node = tree
        for p in parts[:-1]:
            node = node.setdefault(p, {})
        node[parts[-1]] = v
    return tree


def save_params(path: str, params: dict) -> None:
    np.savez(path, **flatten(params))


def load_params(path: str) -> dict:
    with np.load(path) as data:
        return unflatten({k: data[k] for k in data.files})
