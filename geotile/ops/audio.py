"""Audio-modality plumbing: opaque PCM payloads + typed metadata in,
frame-level features out — the audio twin of ops/tiles.py's image
stages. Real codecs (mp3/flac) aren't in this container, so the codec
dispatch table carries one honest entry ('pcm16') and raises
NotImplementedError for the rest — the Ray-side plumbing (schema,
actor-pool stage, per-frame output layout) is real and tested.

Reference parity: the reference has no audio path; this follows the
same actor-pool decode shape as ImageDecodeStage (geotile/ops/
tiles.py:82) per the round-3 multimodal brief.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray.data as rd

FRAME = 1_024


def read_audio_table(
    path: str | list[str],
    columns: list[str] | None = None,
    override_num_blocks: int | None = None,
) -> rd.Dataset:
    """Parquet stand-in reader for the audio table (track_id, sr,
    n_samples, codec, bytes) — same pluggable convention as
    read_image_table."""
    return rd.read_parquet(path, columns=columns,
                           override_num_blocks=override_num_blocks)


class AudioFrameStage:
    """Actor-pool stage: decode PCM payloads and emit one row per
    fixed-size frame with its exact integer energy (Σ s², int64 —
    bounded by 2¹⁵·2¹⁵·frame < 2⁴⁰). Decoder dispatch is actor state;
    the per-batch path is one frombuffer per row + a single vectorized
    square/reshape/sum over the stacked batch — no per-sample Python.
    Batches stay small because rows carry payloads (same law as the
    image stages)."""

    def __init__(self, frame: int = FRAME):
        self.frame = frame
        self.decoders = {
            "pcm16": lambda b: np.frombuffer(b, dtype=np.int16),
        }

    def _decode(self, codec: str, payload: bytes) -> np.ndarray:
        dec = self.decoders.get(codec)
        if dec is None:
            raise NotImplementedError(
                f"codec {codec!r}: only pcm16 ships in this container")
        return dec(payload)

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids = batch["track_id"].to_numpy(zero_copy_only=False)
        codecs = batch["codec"].to_pylist()
        payloads = batch["bytes"].to_pylist()
        rows = [self._decode(c, p) for c, p in zip(codecs, payloads)]
        # tracks in one table share n_samples; group defensively anyway
        groups: dict[int, list[int]] = {}
        for i, r in enumerate(rows):
            groups.setdefault(len(r), []).append(i)
        out_id, out_fr, out_en = [], [], []
        for length, slots in groups.items():
            nfr = length // self.frame
            pcm = np.stack([rows[i][: nfr * self.frame] for i in slots])
            sq = pcm.astype(np.int64) ** 2
            en = sq.reshape(len(slots), nfr, self.frame).sum(axis=2)
            out_id.append(np.repeat(ids[slots], nfr))
            out_fr.append(np.tile(np.arange(nfr, dtype=np.int64),
                                  len(slots)))
            out_en.append(en.ravel())
        return pa.table({
            "track_id": pa.array(np.concatenate(out_id)),
            "frame": pa.array(np.concatenate(out_fr)),
            "energy": pa.array(np.concatenate(out_en)),
        })
