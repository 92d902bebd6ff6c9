"""Per-partition checkpoint / resume / lineage (north_rule requirement).

The checkpoint unit is ONE input shard (a parquet part file — synth
writes the image table that way, and any Lance/parquet dataset at scale
is already sharded). For each shard the runner executes the pipeline on
just that shard, writes its output under ``out_dir/part=<stem>/``
ATOMICALLY (temp dir + rename), then records a manifest row:

    {partition, input_file, input_bytes, input_fingerprint,
     output_rows, output_bytes, lineage: [stage names], elapsed_s}

A killed run resumes by skipping every partition whose manifest exists
and whose input fingerprint still matches — no recomputation (verified
byte-identical in tests/test_checkpoint.py). Manifests double as the
per-partition row/byte metrics sink (reference's log.txt analog,
SURVEY §2.1 S6).
"""

from __future__ import annotations

import json
import shutil
import time
from pathlib import Path
from typing import Callable

import ray.data as rd


def _fingerprint(p: Path) -> str:
    # nanosecond mtime: a shard rewritten with identical size within the
    # same second must still read as changed (ADVICE r1)
    st = p.stat()
    return f"{st.st_size}:{st.st_mtime_ns}"


def manifest_path(out_dir: Path, stem: str) -> Path:
    return Path(out_dir) / f"part={stem}" / "_MANIFEST.json"


def completed_partitions(out_dir: str | Path, input_parts: list[Path]) -> set[str]:
    done = set()
    for p in input_parts:
        mp = manifest_path(Path(out_dir), p.stem)
        if mp.exists():
            try:
                m = json.loads(mp.read_text())
            except json.JSONDecodeError:
                continue
            if m.get("input_fingerprint") == _fingerprint(p):
                done.add(p.stem)
    return done


def run_checkpointed(
    input_dir: str | Path,
    out_dir: str | Path,
    pipeline_fn: Callable[[rd.Dataset], rd.Dataset],
    columns: list[str] | None = None,
    lineage: list[str] | None = None,
    max_partitions: int | None = None,
) -> dict:
    """Run ``pipeline_fn`` per input shard with skip-if-done semantics.
    Returns run stats {partitions_total, partitions_skipped, rows, bytes}.

    ``max_partitions`` processes only the first N unfinished shards —
    used by tests to simulate a killed run.
    """
    input_dir = Path(input_dir)
    out_dir = Path(out_dir)
    out_dir.mkdir(parents=True, exist_ok=True)
    parts = sorted(input_dir.glob("*.parquet"))
    if not parts:
        raise FileNotFoundError(f"no parquet shards under {input_dir}")
    done = completed_partitions(out_dir, parts)
    stats = {
        "partitions_total": len(parts),
        "partitions_skipped": len(done),
        "partitions_run": 0,
        "rows": 0,
        "bytes": 0,
    }
    ran = 0
    for p in parts:
        if p.stem in done:
            continue
        if max_partitions is not None and ran >= max_partitions:
            break
        t0 = time.time()
        # fingerprint BEFORE the (lazy) read executes: if the shard is
        # rewritten mid-run the stamp mismatches on the next scan and
        # the partition reruns — stamping after execution would record
        # the NEW file against the OLD output and freeze it as done
        in_fp = _fingerprint(p)
        in_bytes = p.stat().st_size
        ds = rd.read_parquet(str(p), columns=columns)
        out = pipeline_fn(ds)
        part_dir = out_dir / f"part={p.stem}"
        tmp_dir = out_dir / f".tmp-{p.stem}"
        if tmp_dir.exists():
            shutil.rmtree(tmp_dir)
        if part_dir.exists():
            shutil.rmtree(part_dir)  # stale partial output without manifest
        out.write_parquet(str(tmp_dir))
        tmp_dir.mkdir(parents=True, exist_ok=True)  # zero-row outputs still checkpoint
        out_files = sorted(tmp_dir.glob("*.parquet"))
        out_rows = sum(_pq_rows(f) for f in out_files)
        out_bytes = sum(f.stat().st_size for f in out_files)
        tmp_dir.rename(part_dir)
        manifest = {
            "partition": p.stem,
            "input_file": str(p),
            "input_bytes": in_bytes,
            "input_fingerprint": in_fp,
            "output_rows": out_rows,
            "output_bytes": out_bytes,
            "lineage": lineage or ["read_parquet", "pipeline", "write_parquet"],
            "elapsed_s": round(time.time() - t0, 3),
        }
        mp = manifest_path(out_dir, p.stem)
        mp_tmp = mp.with_suffix(".tmp")
        mp_tmp.write_text(json.dumps(manifest, sort_keys=True))
        mp_tmp.rename(mp)
        stats["partitions_run"] += 1
        stats["rows"] += out_rows
        stats["bytes"] += out_bytes
        ran += 1
    return stats


def _pq_rows(f: Path) -> int:
    import pyarrow.parquet as pq

    return pq.read_metadata(f).num_rows


def read_manifests(out_dir: str | Path) -> list[dict]:
    return [
        json.loads(p.read_text())
        for p in sorted(Path(out_dir).glob("part=*/_MANIFEST.json"))
    ]
