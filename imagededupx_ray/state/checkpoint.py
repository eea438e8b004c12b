"""Checkpointed, resumable snapshot store with lineage + per-stage metrics
(SURVEY.md §3.2 "ours" — the reference's incremental-indexing idea reborn).

Reference analogues replaced:
- pickle feature cache ``{'image_paths','image_hashes','features_cache',...}``
  (/root/reference/improved_faiss_detector.py:508-520) → Parquet stage outputs
  under ``<root>/<stage>/snapshot=<id>/part-*.parquet``.
- FAISS index + pickle path sidecar (:558-609) → the ``signatures`` and
  ``lsh_index`` Parquet tables themselves (content-addressed doc_ids, no
  positional sidecars).
- MD5 change detection new/modified/deleted (:269-295) → anti-join of the new
  snapshot against the manifest's (url, text_sha256) set.
- rebuild-whole-index-from-cache (:456-457) → per-snapshot delta build +
  bucket-union merge; unchanged work is never redone.

Every snapshot writes a ``manifest.json``: config hash, parent snapshot id
(lineage), per-stage row counts and wall times. Resuming under a different
DedupConfig REFUSES (config_hash mismatch) — SURVEY.md §7.4.
"""

from __future__ import annotations

import json
import os
import time
from typing import Any

from imagededupx_ray.config import DedupConfig


class SnapshotStore:
    def __init__(self, root: str, cfg: DedupConfig):
        self.root = root
        self.cfg = cfg
        os.makedirs(root, exist_ok=True)

    # ------------------------------------------------------------- manifests
    def _manifest_path(self, snapshot: str) -> str:
        return os.path.join(self.root, f"snapshot={snapshot}", "manifest.json")

    def manifest(self, snapshot: str) -> dict | None:
        p = self._manifest_path(snapshot)
        if not os.path.exists(p):
            return None
        with open(p) as f:
            return json.load(f)

    COMPLETE_STAGES = ("docs_meta", "signatures", "verified_pairs", "clusters")

    def is_complete(self, snapshot: str) -> bool:
        m = self.manifest(snapshot)
        return bool(m) and all(s in m.get("stages", {}) for s in self.COMPLETE_STAGES)

    def latest_snapshot(self) -> str | None:
        """Newest COMPLETE snapshot (a crashed build leaves a manifest with
        missing stages — it must never be picked as a merge parent)."""
        snaps = [
            d.split("=", 1)[1]
            for d in os.listdir(self.root)
            if d.startswith("snapshot=") and self.is_complete(d.split("=", 1)[1])
        ]
        if not snaps:
            return None
        # lineage-aware: the snapshot that is nobody's parent is the tip
        parents = {self.manifest(s).get("parent") for s in snaps}
        tips = [s for s in snaps if s not in parents]
        return sorted(tips)[-1] if tips else sorted(snaps)[-1]

    def check_config(self, snapshot: str) -> None:
        m = self.manifest(snapshot)
        if m and m["config_hash"] != self.cfg.config_hash:
            raise ValueError(
                f"snapshot {snapshot} was built with config {m['config_hash']}, "
                f"current config is {self.cfg.config_hash}: refusing to resume "
                "across a config change (rebuild from scratch or restore config)"
            )

    # ----------------------------------------------------------- stage paths
    def stage_dir(self, snapshot: str, stage: str) -> str:
        return os.path.join(self.root, f"snapshot={snapshot}", stage)

    def has_stage(self, snapshot: str, stage: str) -> bool:
        m = self.manifest(snapshot)
        return bool(m and stage in m.get("stages", {}))

    def write_stage(self, snapshot: str, stage: str, ds, t0: float | None = None) -> str:
        """write_parquet a stage output + record rows/wall in the manifest.
        Written to a temp dir then renamed (atomic-ish completion marker)."""
        final = self.stage_dir(snapshot, stage)
        tmp = final + ".tmp"
        if os.path.exists(tmp):
            import shutil

            shutil.rmtree(tmp)
        os.makedirs(os.path.dirname(final), exist_ok=True)
        start = t0 if t0 is not None else time.monotonic()
        # pre-create: write_parquet of an EMPTY dataset writes no files and
        # no directory, which would break the atomic rename below
        os.makedirs(tmp, exist_ok=True)
        ds.write_parquet(tmp)
        os.replace(tmp, final)
        rows = ds.count()
        self._update_manifest(
            snapshot,
            stage_update={
                stage: {"rows": rows, "wall_sec": round(time.monotonic() - start, 3)}
            },
        )
        return final

    def read_stage(self, snapshot: str, stage: str):
        import ray.data as rd

        return rd.read_parquet(self.stage_dir(snapshot, stage))

    def _update_manifest(
        self,
        snapshot: str,
        parent: str | None = None,
        stage_update: dict[str, Any] | None = None,
    ) -> None:
        m = self.manifest(snapshot) or {
            "snapshot": snapshot,
            "parent": parent,
            "config_hash": self.cfg.config_hash,
            "config": self.cfg.to_dict(),
            "stages": {},
        }
        if parent is not None:
            m["parent"] = parent
        if stage_update:
            m["stages"].update(stage_update)
        p = self._manifest_path(snapshot)
        os.makedirs(os.path.dirname(p), exist_ok=True)
        tmp = p + ".tmp"
        with open(tmp, "w") as f:
            json.dump(m, f, indent=1)
        os.replace(tmp, p)

    def init_snapshot(self, snapshot: str, parent: str | None = None) -> None:
        self.check_config(snapshot)
        self._update_manifest(snapshot, parent=parent)
