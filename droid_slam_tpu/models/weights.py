"""Convert reference torch checkpoints (droid.pth) to Flax parameter pytrees.

The reference loads `droid.pth`, strips the DDP ``module.`` prefix and
truncates the 4-channel delta/weight heads to 2 channels
(/root/reference/droid_slam/droid.py:46-60). This converter reproduces that,
plus the layout changes of the TPU build:

  * conv kernels OIHW → HWIO,
  * module names per `droid_slam_tpu.models` (see _KEY_MAP),
  * instance norms are affine-free in both frameworks → no norm params.

Works from a raw ``{name: np.ndarray}`` state dict, so torch is only needed
to deserialise the pickle (guarded import — the SLAM runtime itself never
touches torch).
"""

from __future__ import annotations

from typing import Dict, Mapping

import numpy as np

# torch sequential index → flax module name, per submodule
_SEQ_MAP = {
    "corr_encoder.0": "corr_enc1",
    "corr_encoder.2": "corr_enc2",
    "flow_encoder.0": "flow_enc1",
    "flow_encoder.2": "flow_enc2",
    "weight.0": "weight1",
    "weight.2": "weight2",
    "delta.0": "delta1",
    "delta.2": "delta2",
    "agg.conv1": "agg.conv1",
    "agg.conv2": "agg.conv2",
    "agg.eta.0": "agg.eta",
    "agg.upmask.0": "agg.upmask",
    "gru.convz": "gru.convz",
    "gru.convr": "gru.convr",
    "gru.convq": "gru.convq",
    "gru.w": "gru.w",
    "gru.convz_glo": "gru.convz_glo",
    "gru.convr_glo": "gru.convr_glo",
    "gru.convq_glo": "gru.convq_glo",
}

# heads whose first-2-of-4 output channels are kept (droid.py:54-57)
_TRUNCATED = {"update.weight.2", "update.delta.2"}


def _encoder_key(rest: str) -> str:
    """fnet/cnet sub-key → flax path. torch `layerK.B.convN` →
    `layerK_B.convN`; `layerK.B.downsample.0` → `layerK_B.downsample`."""
    if rest.startswith("conv"):
        return rest.split(".")[0]
    parts = rest.split(".")
    layer, block = parts[0], parts[1]
    tail = parts[2]
    name = f"{layer}_{block}"
    if tail == "downsample":
        return f"{name}.downsample"
    return f"{name}.{tail}"


def torch_state_dict_to_flax(state: Mapping[str, np.ndarray]) -> Dict:
    """Convert a reference state dict (numpy values) to {'params': ...}."""
    params: Dict = {}

    def put(path: str, leaf_name: str, value: np.ndarray):
        node = params
        for part in path.split("."):
            node = node.setdefault(part, {})
        node[leaf_name] = np.ascontiguousarray(value)

    for key, value in state.items():
        if key.startswith("module."):
            key = key[len("module.") :]
        base, leaf = key.rsplit(".", 1)  # leaf: weight | bias

        if base in _TRUNCATED:
            value = value[:2]

        top, rest = key.split(".", 1)
        if top in ("fnet", "cnet"):
            rest_base = rest.rsplit(".", 1)[0]
            path = f"{top}.{_encoder_key(rest_base)}"
        elif top == "update":
            rest_base = rest.rsplit(".", 1)[0]
            if rest_base not in _SEQ_MAP:
                raise KeyError(f"unmapped update parameter: {key}")
            path = f"update.{_SEQ_MAP[rest_base]}"
        else:
            raise KeyError(f"unmapped parameter: {key}")

        if leaf == "weight":
            if value.ndim == 4:  # conv OIHW → HWIO
                value = value.transpose(2, 3, 1, 0)
            put(path, "kernel", value)
        elif leaf == "bias":
            put(path, "bias", value)
        else:
            raise KeyError(f"unexpected leaf: {key}")

    return {"params": params}


def load_reference_checkpoint(path: str) -> Dict:
    """Load droid.pth (torch pickle) and convert. Requires torch (cpu)."""
    import torch  # local import — only the converter needs it

    state = torch.load(path, map_location="cpu", weights_only=True)
    numpy_state = {k: v.detach().numpy() for k, v in state.items()}
    return torch_state_dict_to_flax(numpy_state)
