"""Per-config XLA compiler options (TPU workarounds).

The TPU compiler's space-to-batch converter CHECK-crashes
(``space_to_batch_converter.cc:543 Check failed:
std::abs(halo_size - low_padding) <= spatial_split_size``) while compiling
the backward pass of multi-scale where2comm fusion inside the segmentation
graph — a batch-1 small-channel conv in the seg crop/resize chain trips the
pass's halo bookkeeping. Disabling the pass (both the classic and
new-platform gates; verified on the real chip: either alone still crashes)
compiles and trains correctly, re-enabling ``multi_scale: true`` for seg
configs. Space-to-batch is a throughput optimization for small-batch
spatial convs, so it stays ON everywhere else.
"""

from __future__ import annotations

SPACE_TO_BATCH_OFF = {
    "xla_tpu_run_space_to_batch": "false",
    "xla_tpu_run_space_to_batch_on_new_platforms": "false",
}


def _is_tpu_backend() -> bool:
    import jax

    try:
        return jax.default_backend() not in ("cpu", "gpu")
    except Exception:
        return False


def model_compiler_options(hypes: dict) -> dict | None:
    """Options for jitting programs containing the config's model, or None.

    Currently: the space-to-batch workaround for seg-task configs on TPU
    backends (the det graph compiles fine with the pass enabled).
    """
    args = hypes["model"]["args"]
    task = hypes.get("task", args.get("task", "det"))
    if task == "seg" and _is_tpu_backend():
        return dict(SPACE_TO_BATCH_OFF)
    return None
