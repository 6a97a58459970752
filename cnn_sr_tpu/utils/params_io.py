"""Bit-compatible codec for the reference's JSON parameters file.

File format (reference README.md:92-113; written by
ConfigBasedDataPipeline::write_params_to_file, ConfigBasedDataPipeline.cpp:432-465;
read by load_parameters_file, ConfigBasedDataPipeline.cpp:388-414):

.. code-block:: js

    {
      "epochs": 0,
      "layer1": { "weights": [..], "bias": [..] },
      "layer2": { "weights": [..], "bias": [..] },
      "layer3": { "weights": [..], "bias": [..] }
    }

``weights`` is the flat float list in the reference's 4D layout
``index(w[a,b,n,k]) = a·f·N·K + b·N·K + k·N + n`` (layer_uber_kernel.cl:3-12),
i.e. an ``[f(dy), f(dx), K(prev), N(curr)]`` array flattened with the
current-filter index ``n`` fastest — which is exactly JAX's **HWIO**
filter layout, so weights trained by the reference reshape straight into
``lax.conv_general_dilated`` with no transposition.

``epochs`` is optional on read and restores the training epoch counter
(ConfigBasedDataPipeline.cpp:397-400).

For deeper layer-list-generic models we extend the same schema with keys
``layer4``, ``layer5``, … — reference 3-layer files remain readable and
files we write for 3-layer models remain readable by the reference.
"""

from __future__ import annotations

import json
from typing import List, Optional, Sequence, Tuple

import numpy as np

from .config import LayerSpec


class ParametersFileError(ValueError):
    """Raised when a parameters file is unreadable or shape-incompatible."""


Params = List[dict]  # [{"w": (f,f,k,n) f32 array, "b": (n,) f32 array}, ...]


def flat_to_hwio(flat: Sequence[float], f: int, k: int, n: int) -> np.ndarray:
    """Reshape the reference's flat weight list into HWIO ``(f, f, k, n)``."""
    arr = np.asarray(flat, dtype=np.float32)
    expected = f * f * k * n
    if arr.size != expected:
        raise ParametersFileError(
            f"weights size mismatch: got {arr.size}, expected {expected} "
            f"(f={f}, k={k}, n={n})"
        )
    return arr.reshape(f, f, k, n)


def hwio_to_flat(w: np.ndarray) -> np.ndarray:
    """Flatten an HWIO weight array back to the reference's order."""
    return np.asarray(w, dtype=np.float32).ravel()


def load_parameters_file(path: str, specs: Sequence[LayerSpec]) -> Tuple[Params, int]:
    """Load params for the given layer stack. Returns ``(params, epochs)``.

    Validates each layer's weight/bias sizes against the specs the same
    way LayerData::validate does (LayerData.cpp:20-42). Unknown keys are
    warned about and ignored (ConfigBasedDataPipeline.cpp:408-410).
    """
    with open(path, "r") as fh:
        try:
            raw = json.load(fh)
        except json.JSONDecodeError as e:
            raise ParametersFileError(f"could not parse '{path}': {e}") from e
    if not isinstance(raw, dict):
        raise ParametersFileError("parameters file root must be a JSON object")

    epochs = int(raw.get("epochs", 0))
    params: Params = []
    for i, spec in enumerate(specs):
        key = f"layer{i + 1}"
        if key not in raw:
            raise ParametersFileError(f"missing '{key}' in parameters file")
        node = raw[key]
        weights = node.get("weights")
        bias = node.get("bias")
        if weights is None or bias is None:
            raise ParametersFileError(f"'{key}' must contain 'weights' and 'bias'")
        w = flat_to_hwio(weights, spec.f, spec.n_in, spec.n_out)
        b = np.asarray(bias, dtype=np.float32)
        if b.size != spec.bias_size:
            raise ParametersFileError(
                f"'{key}' bias size mismatch: got {b.size}, expected {spec.bias_size}"
            )
        params.append({"w": w, "b": b})

    known = {"epochs"} | {f"layer{i + 1}" for i in range(len(specs))}
    for key in raw:
        if key not in known:
            print(f"[Warning] Unknown key '{key}' in parameters file")
    return params, epochs


def _fmt_floats(arr: np.ndarray) -> str:
    # round-trip-exact decimal per float32 value; comma-separated like
    # cnn_sr::utils::dump_vector (pch.cpp:29-54) but at full precision so
    # save→load round-trips are bit-exact. The native C formatter handles
    # big arrays ~20x faster; the Python path is the fallback.
    values = np.asarray(arr, dtype=np.float32).ravel()
    try:
        from .. import native

        if native.available():
            return native.format_floats(values)
    except (IOError, OSError, ValueError):
        pass
    return ", ".join(repr(float(v)) for v in values)


def save_parameters_file(path: str, params: Params, epochs: int = 0) -> None:
    """Write params in the reference's file layout
    (ConfigBasedDataPipeline.cpp:432-465)."""
    chunks = ["{", f'  "epochs": {int(epochs)},', ""]
    for i, layer in enumerate(params):
        key = f"layer{i + 1}"
        chunks.append(f'  "{key}":{{')
        chunks.append(f'    "weights": [{_fmt_floats(hwio_to_flat(layer["w"]))}],')
        chunks.append(f'    "bias": [{_fmt_floats(layer["b"])}]')
        tail = "  }," if i + 1 < len(params) else "  }"
        chunks.append(tail)
    chunks.append("}")
    with open(path, "w") as fh:
        fh.write("\n".join(chunks))


def random_parameters(
    specs: Sequence[LayerSpec],
    distributions,
    seed: Optional[int] = None,
) -> Params:
    """Random-init weights/biases from per-layer normal distributions
    (fill_random_parameters, ConfigBasedDataPipeline.cpp:366-379)."""
    rng = np.random.default_rng(seed)
    params: Params = []
    for spec, d in zip(specs, distributions):
        w = rng.normal(d.mean_w, d.sd_w, size=(spec.f, spec.f, spec.n_in, spec.n_out))
        if d.sd_b > 0:
            b = rng.normal(d.mean_b, d.sd_b, size=(spec.n_out,))
        else:
            b = np.full((spec.n_out,), d.mean_b)
        params.append({"w": w.astype(np.float32), "b": b.astype(np.float32)})
    return params
