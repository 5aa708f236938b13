"""Multi-frame temporal batch contract (SCOPE / How2comm family).

Every per-frame array gains a leading time axis after batch —
``points (B, T, L, N, 4)``, ``points_mask (B, T, L, N)``,
``agent_mask (B, T, L)``, ``pairwise_t_full (B, T, L, L, 4, 4)`` and
``history_t (B, T, 4, 4)`` (history-ego -> current-ego transforms). The
last frame (index T-1) is the current one; labels reference it — matching
the reference's K-frame dataset lists
(intermediate_fusion_dataset_multi_frame_how2comm.py:28,93-104).

The faithful models live in scope_model.py (LSTM temporal fusion +
confidence-masked collaboration + late blending) and how2comm_model.py
(flow compensation + mutual communication + STCFormer).
"""
