"""Video-modality plumbing: multi-frame binary payloads + typed
metadata in, sampled-frame features out — the video twin of
ops/audio.py. The one honest codec is 'rawseq' (concatenated raw
RGB frames, the synth stand-in); anything else raises
NotImplementedError so a real decoder slots in without changing the
pipeline shape (same contract as tiles.FrameSampleStage, which
handles the still-image degenerate case)."""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray.data as rd


def read_video_table(
    path: str | list[str],
    columns: list[str] | None = None,
    override_num_blocks: int | None = None,
) -> rd.Dataset:
    return rd.read_parquet(path, columns=columns,
                           override_num_blocks=override_num_blocks)


class VideoFrameStage:
    """Actor-pool stage: decode each clip's frame sequence, keep every
    ``every_n``-th frame, and emit one row per SAMPLED frame with its
    exact integer pixel sum (the cheap per-frame checksum a real
    feature extractor would replace). The whole batch's sampled
    frames reduce in one vectorized sum over a stacked
    (clips × samples, h, w, 3) tensor — no per-pixel Python."""

    def __init__(self, every_n: int = 4):
        self.every_n = every_n

    def __call__(self, batch: pa.Table) -> pa.Table:
        codecs = set(batch["codec"].to_pylist())
        if codecs - {"rawseq"}:
            raise NotImplementedError(
                f"no video codec for {sorted(codecs - {'rawseq'})} in "
                "this container — drop a decoder into VideoFrameStage")
        ids = batch["clip_id"].to_numpy(zero_copy_only=False)
        nf = batch["n_frames"].to_numpy(zero_copy_only=False)
        ws = batch["w"].to_numpy(zero_copy_only=False)
        hs = batch["h"].to_numpy(zero_copy_only=False)
        payloads = batch["bytes"].to_pylist()
        out_id, out_fr, out_sum = [], [], []
        groups: dict[tuple[int, int, int], list[int]] = {}
        for i, key in enumerate(zip(nf, ws, hs)):
            groups.setdefault(tuple(int(x) for x in key), []).append(i)
        for (f, w, h), slots in groups.items():
            clips = np.stack([
                np.frombuffer(payloads[i], dtype=np.uint8)
                .reshape(f, h, w, 3) for i in slots])
            sel = np.arange(0, f, self.every_n)
            sampled = clips[:, sel]  # (k, s, h, w, 3)
            sums = sampled.astype(np.int64).sum(axis=(2, 3, 4))
            k, s = sums.shape
            out_id.append(np.repeat(ids[slots], s))
            out_fr.append(np.tile(sel.astype(np.int64), k))
            out_sum.append(sums.reshape(-1))
        return pa.table({
            "clip_id": pa.array(np.concatenate(out_id)),
            "frame_idx": pa.array(np.concatenate(out_fr)),
            "pixel_sum": pa.array(np.concatenate(out_sum)),
        })


class VideoMotionStage:
    """Actor-pool stage: per clip, exact integer MOTION energy between
    consecutive frames — motion_total = Σ_t Σ_px |f[t+1] − f[t]|,
    motion_peak = the largest single-transition energy, peak_idx = the
    first transition index attaining it. All clips in a (frames, w, h)
    group reduce in one |diff| over the stacked 5-D tensor (uint8
    promoted to int64 before subtraction — bounded by 255·px·frames
    ≪ 2⁶³). Same codec gate and payload-batch law as VideoFrameStage."""

    def __call__(self, batch: pa.Table) -> pa.Table:
        codecs = set(batch["codec"].to_pylist())
        if codecs - {"rawseq"}:
            raise NotImplementedError(
                f"no video codec for {sorted(codecs - {'rawseq'})} in "
                "this container — drop a decoder into VideoMotionStage")
        ids = batch["clip_id"].to_numpy(zero_copy_only=False)
        nf = batch["n_frames"].to_numpy(zero_copy_only=False)
        ws = batch["w"].to_numpy(zero_copy_only=False)
        hs = batch["h"].to_numpy(zero_copy_only=False)
        payloads = batch["bytes"].to_pylist()
        groups: dict[tuple[int, int, int], list[int]] = {}
        for i, key in enumerate(zip(nf, ws, hs)):
            groups.setdefault(tuple(int(x) for x in key), []).append(i)
        out_id, out_tot, out_peak, out_idx = [], [], [], []
        for (f, w, h), slots in groups.items():
            clips = np.stack([
                np.frombuffer(payloads[i], dtype=np.uint8)
                .reshape(f, h, w, 3) for i in slots]).astype(np.int64)
            per_pair = np.abs(clips[:, 1:] - clips[:, :-1]) \
                .sum(axis=(2, 3, 4))  # (k, f-1)
            out_id.append(ids[slots])
            out_tot.append(per_pair.sum(axis=1))
            out_peak.append(per_pair.max(axis=1))
            out_idx.append(per_pair.argmax(axis=1).astype(np.int64))
        return pa.table({
            "clip_id": pa.array(np.concatenate(out_id)),
            "motion_total": pa.array(np.concatenate(out_tot)),
            "motion_peak": pa.array(np.concatenate(out_peak)),
            "peak_idx": pa.array(np.concatenate(out_idx)),
        })
