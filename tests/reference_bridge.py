"""Import the reference's LITERAL torch code for differential testing.

Every other parity oracle in this suite was re-derived (numpy loss oracle,
scipy matcher check, pycocotools port) — a shared misreading of the
reference would slip through all of them. This bridge imports
/root/reference/src/{matcher,losses,models}.py *unchanged* so tests can run
the actual ``PushPullLoss`` / ``HungarianMatcher`` / ``OwlViT`` against
``owlvit_tpu`` on identical tensors.

The only missing dependency is torchvision (absent in this env). The
reference touches exactly three names from it:

  * ``box_area``      — used numerically (matcher.py:3,9-10); shimmed with
                        the 2-line definition torchvision documents.
  * ``nms``/``batched_nms`` — imported by models.py:8 but only called inside
                        ``PostProcess`` (models.py:141), which these tests
                        never construct; the shim raises if reached.

No reference code is modified; the shim lives purely in sys.modules.
"""

from __future__ import annotations

import sys
import types

import torch

_REFERENCE_ROOT = "/root/reference"


def _box_area(boxes: torch.Tensor) -> torch.Tensor:
    # torchvision.ops.box_area for xyxy boxes — (x2-x1)*(y2-y1)
    return (boxes[:, 2] - boxes[:, 0]) * (boxes[:, 3] - boxes[:, 1])


def _unused(*_a, **_k):
    raise NotImplementedError(
        "torchvision shim: nms/batched_nms are import-only for these tests"
    )


def load_reference():
    """Returns the reference's (matcher, losses, models) modules, literally.

    /root/reference/src has no __init__.py; it imports fine as a namespace
    package once /root/reference is on sys.path (losses.py does
    ``from src.matcher import ...`` itself, matcher.py:6).
    """
    # transformers probes torchvision availability at import time; import it
    # BEFORE the shim exists so it (correctly) records torchvision as absent
    # and never routes through our import-only fake.
    import transformers  # noqa: F401

    if "torchvision" not in sys.modules:
        import importlib.machinery

        tv = types.ModuleType("torchvision")
        tv.__spec__ = importlib.machinery.ModuleSpec("torchvision", None)
        tv.__version__ = "0.0.0+shim"
        ops = types.ModuleType("torchvision.ops")
        ops.box_area = _box_area
        ops.nms = _unused
        ops.batched_nms = _unused
        tv.ops = ops
        sys.modules["torchvision"] = tv
        sys.modules["torchvision.ops"] = ops
    if _REFERENCE_ROOT not in sys.path:
        sys.path.insert(0, _REFERENCE_ROOT)
    import src.losses  # noqa: E402  (the reference's, via namespace pkg)
    import src.matcher  # noqa: E402
    import src.models  # noqa: E402

    return src.matcher, src.losses, src.models
