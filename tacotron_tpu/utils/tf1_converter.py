"""TF1 reference checkpoint -> tacotron_tpu pytree converter (SURVEY.md §5.4).

The parity bridge: when/if reference TF1 checkpoints materialise
(/root/reference was empty at survey AND build time — SURVEY.md §0), this maps
their variable names onto our param paths so mel/linear allclose runs against
fixed checkpoints (BASELINE.json:5,10) need no retraining.

The name table below follows the tf.contrib-era scoping the reference's
graph would produce (SURVEY.md §2.1 #9, #10 [R]: BahdanauAttention +
AttentionWrapper + OutputProjectionWrapper + ResidualWrapper under
dynamic_rnn). Entries are PATTERNS, verified lazily: convert() reports
unmatched names on both sides instead of guessing.

Loading TF1 checkpoints without TensorFlow: the CheckpointReader in
`tensorflow` would be the normal route; this image has torch-cpu but not TF,
so convert() accepts any {name: ndarray} dict (e.g. produced offline by
`tf.train.load_checkpoint` + np.savez) and works from there.
"""

from __future__ import annotations

import re

import numpy as np


# pattern on the TF1 side -> (our path, transform)
# transforms: None = copy; "gru_gates" = TF fused gate kernel [x,h]x2d as-is;
# callables receive the array.
NAME_TABLE: list[tuple[str, str]] = [
    (r".*embedding.*", "encoder/embed/embedding"),
    (r".*encoder.*prenet.*dense(_1)?/kernel", "encoder/prenet/fc{i}/kernel"),
    (r".*encoder.*prenet.*dense(_1)?/bias", "encoder/prenet/fc{i}/bias"),
    (r".*conv1d_banks.*conv1d_(\d+)/kernel", "encoder/cbhg/bank/conv{i}/kernel"),
    (r".*conv1d_banks.*batch_normalization.*", "encoder/cbhg/bank/bn{i}/bn/..."),
    (r".*highwaynet_(\d+)/dense/kernel", "encoder/cbhg/highway/H{i}/kernel"),
    (r".*highwaynet_(\d+)/dense_1/kernel", "encoder/cbhg/highway/T{i}/kernel"),
    (r".*gru_cell/gates/kernel", ".../gates_x+gates_h (split rows at d_in)"),
    (r".*gru_cell/candidate/kernel", ".../cand_x+cand_h (split rows at d_in)"),
    (r".*bahdanau_attention/query_layer/kernel", "decoder/cell/attention/query/kernel"),
    (r".*bahdanau_attention/memory_layer/kernel", "memory_proj/kernel"),
    (r".*bahdanau_attention/attention_v", "decoder/cell/attention/v"),
    (r".*attention_wrapper.*gru_cell.*", "decoder/cell/attention_gru/..."),
    (r".*decoder.*output_projection.*", "decoder/cell/decoder_input_proj/..."),
    (r".*dense(_\d+)?/kernel$", "postnet/linear_proj|decoder/cell/frame_proj (by shape)"),
]


def split_tf_gru_kernel(kernel: np.ndarray, d_in: int):
    """TF fused [x, h] @ W kernel -> (x-part, h-part) matching ops/gru layout."""
    return kernel[:d_in], kernel[d_in:]


def convert(tf_vars: dict[str, np.ndarray], target_params) -> dict:
    """Best-effort mapping; returns {matched, unmatched_tf, unmatched_ours}.

    This is intentionally a REPORTING converter until real reference
    checkpoints exist to verify against (none do — the reference mount is
    empty); it must not silently mis-assign weights.
    """
    import jax

    flat_ours = {
        "/".join(str(k.key) for k in path): leaf
        for path, leaf in jax.tree_util.tree_flatten_with_path(target_params)[0]
    }
    matched: dict[str, str] = {}
    unmatched_tf = []
    for name, arr in tf_vars.items():
        hit = None
        for pat, ours in NAME_TABLE:
            if re.match(pat, name):
                hit = ours
                break
        if hit is None:
            unmatched_tf.append(name)
        else:
            matched[name] = hit
    unmatched_ours = [k for k in flat_ours if k not in matched.values()]
    return {
        "matched": matched,
        "unmatched_tf": unmatched_tf,
        "unmatched_ours": unmatched_ours,
    }
