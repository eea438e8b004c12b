"""Checkpointed, resumable snapshot store with lineage + per-stage metrics
(SURVEY.md §3.2 "ours" — the reference's incremental-indexing idea reborn).

Reference analogues replaced:
- pickle feature cache ``{'image_paths','image_hashes','features_cache',...}``
  (/root/reference/improved_faiss_detector.py:508-520) → Parquet stage outputs
  under ``<root>/snapshot=<id>/<stage>/part-*.parquet``.
- FAISS index + pickle path sidecar (:558-609) → the ``signatures`` and
  ``lsh_index`` Parquet tables themselves (content-addressed sig_ids, no
  positional sidecars).
- MD5 change detection new/modified/deleted (:269-295) → anti-join of the new
  snapshot against the manifest's (doc_id, text_sha256) set.
- rebuild-whole-index-from-cache (:456-457) → APPEND-ONLY multi-part stages:
  a merge writes only its delta part; the manifest records the full ordered
  list of part directories (parent parts + own delta), so unchanged data is
  never rewritten OR re-read for rewriting. This is the ``index_partitions``
  persistence SURVEY §1.2/§3.2 promises.

Deletes never rewrite parts either: each snapshot carries small *sidecar*
arrays (``dead_row_keys`` — (doc_id, sig_id)-combo keyed — and
``extinct_sig_ids``) and a stage may declare an
``exclude`` filter — at read time, rows whose listed columns match the
sidecar array are dropped (vectorized searchsorted, no python rows). A
tombstoned doc that reappears later simply leaves the sidecar ("resurrection"
— the physical rows become visible again, nothing is recomputed).

Every snapshot writes a ``manifest.json``: config hash, parent snapshot id
(lineage), per-stage part dirs + logical row counts and wall times. Resuming
under a different DedupConfig REFUSES (config_hash mismatch) — SURVEY.md §7.4.

Compaction: part lists grow by one dir per merge and sidecars grow with total
deletions; ``compact_stage`` folds a stage's parts+filter into a single fresh
part (an explicit maintenance op, never implicit).
"""

from __future__ import annotations

import json
import os
import time
from typing import Any

import numpy as np

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

    COMPLETE_STAGES = (
        "docs_meta",
        "signatures",
        "lsh_index",
        "verified_pairs",
        "clusters",
    )

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

    def _rel(self, abs_dir: str) -> str:
        return os.path.relpath(abs_dir, self.root)

    def stage_dirs(self, snapshot: str, stage: str) -> list[str]:
        """Ordered ABS part dirs of a stage (parent parts first, own delta
        last). Store-relative in the manifest so a copied store still works."""
        m = self.manifest(snapshot)
        if not m or stage not in m.get("stages", {}):
            return []
        ent = m["stages"][stage]
        rels = ent.get("dirs") or [self._rel(self.stage_dir(snapshot, stage))]
        return [os.path.join(self.root, r) for r in rels]

    def has_stage(self, snapshot: str, stage: str) -> bool:
        m = self.manifest(snapshot)
        return bool(m and stage in m.get("stages", {}))

    def write_stage(
        self,
        snapshot: str,
        stage: str,
        ds,
        t0: float | None = None,
        parent_dirs: list[str] | None = None,
        exclude: dict | None = None,
        rows: int | None = None,
    ) -> str:
        """write_parquet the stage's OWN (delta) part + record the composed
        part list and logical row count in the manifest. Written to a temp dir
        then renamed (atomic-ish completion marker).

        parent_dirs: inherited part dirs (abs), prepended before the own dir.
        exclude: {"sidecar": <name>, "columns": [...]} — read_stage drops rows
        whose listed columns match this snapshot's sidecar array.
        rows: logical row count of the COMPOSED stage (defaults to ds.count(),
        right only for single-part stages)."""
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
        if not any(f.endswith(".parquet") for f in os.listdir(tmp)):
            # a 0-row dataset writes no files; a part dir must stay readable
            import pyarrow as pa
            import pyarrow.parquet as pq

            sch = ds.schema()
            pa_schema = getattr(sch, "base_schema", None) or pa.schema(
                list(zip(sch.names, sch.types))
            )
            pq.write_table(pa_schema.empty_table(), os.path.join(tmp, "empty.parquet"))
        os.replace(tmp, final)
        if rows is None:
            rows = ds.count()
        ent: dict[str, Any] = {
            "rows": int(rows),
            "wall_sec": round(time.monotonic() - start, 3),
            "dirs": [self._rel(d) for d in (parent_dirs or [])] + [self._rel(final)],
            "own": self._rel(final),
        }
        if exclude:
            ent["exclude"] = exclude
        self._update_manifest(snapshot, stage_update={stage: ent})
        return final

    def read_stage(self, snapshot: str, stage: str):
        """Composed logical view: union of all part dirs, minus rows matched
        by the stage's exclude sidecar (if any, and non-empty)."""
        import ray.data as rd

        dirs = self.stage_dirs(snapshot, stage)
        if not dirs:
            dirs = [self.stage_dir(snapshot, stage)]
        m = self.manifest(snapshot)
        ent = (m or {}).get("stages", {}).get(stage, {})
        exc = ent.get("exclude")
        if exc and exc.get("scope") == "parents":
            # patch composition: ancestor parts are filtered by the sidecar,
            # this snapshot's own (patch) part rides through untouched — every
            # excluded key's live row is guaranteed to be in the own part
            own = os.path.join(self.root, ent["own"])
            parent_dirs = [d for d in dirs if os.path.abspath(d) != os.path.abspath(own)]
            arr = self.read_sidecar(snapshot, exc["sidecar"])
            if parent_dirs:
                parents = rd.read_parquet(parquet_files(parent_dirs))
                if len(arr):
                    parents = _exclude_rows(parents, exc["columns"], arr)
                return parents.union(rd.read_parquet(parquet_files([own])))
            return rd.read_parquet(parquet_files([own]))
        ds = rd.read_parquet(parquet_files(dirs))
        if exc:
            arr = self.read_sidecar(snapshot, exc["sidecar"])
            if len(arr):
                ds = _exclude_rows(ds, exc["columns"], arr)
        return ds

    def read_stage_own(self, snapshot: str, stage: str):
        """Only this snapshot's own (delta) part, unfiltered."""
        import ray.data as rd

        m = self.manifest(snapshot)
        ent = (m or {}).get("stages", {}).get(stage, {})
        own = ent.get("own")
        d = os.path.join(self.root, own) if own else self.stage_dir(snapshot, stage)
        return rd.read_parquet(d)

    # -------------------------------------------------------------- sidecars
    # small bounded arrays (tombstoned doc ids, extinct sig ids): one parquet
    # file each, written atomically — never corpus-sized
    def sidecar_path(self, snapshot: str, name: str) -> str:
        return os.path.join(self.root, f"snapshot={snapshot}", f"{name}.parquet")

    def has_sidecar(self, snapshot: str, name: str) -> bool:
        return os.path.exists(self.sidecar_path(snapshot, name))

    def write_sidecar(self, snapshot: str, name: str, arr: np.ndarray) -> None:
        import pyarrow as pa
        import pyarrow.parquet as pq

        p = self.sidecar_path(snapshot, name)
        os.makedirs(os.path.dirname(p), exist_ok=True)
        tmp = p + ".tmp"
        pq.write_table(
            pa.table({"v": pa.array(np.asarray(arr, dtype=np.int64), type=pa.int64())}),
            tmp,
        )
        os.replace(tmp, p)

    def read_sidecar(self, snapshot: str, name: str) -> np.ndarray:
        import pyarrow.parquet as pq

        p = self.sidecar_path(snapshot, name)
        if not os.path.exists(p):
            return np.empty(0, dtype=np.int64)
        return np.sort(
            pq.read_table(p)["v"].to_numpy(zero_copy_only=False).astype(np.int64)
        )

    def write_sidecar_cols(
        self, snapshot: str, name: str, cols: dict[str, np.ndarray]
    ) -> None:
        """Multi-column sidecar (parallel i64 arrays, row order preserved) —
        for pair-bounded lookup tables like the per-snapshot (sig, cluster
        label) map the patch-based clusters merge diffs against."""
        import pyarrow as pa
        import pyarrow.parquet as pq

        p = self.sidecar_path(snapshot, name)
        os.makedirs(os.path.dirname(p), exist_ok=True)
        tmp = p + ".tmp"
        pq.write_table(
            pa.table(
                {
                    k: pa.array(np.asarray(v, dtype=np.int64), type=pa.int64())
                    for k, v in cols.items()
                }
            ),
            tmp,
        )
        os.replace(tmp, p)

    def read_sidecar_cols(self, snapshot: str, name: str) -> dict[str, np.ndarray]:
        """Row-order-preserving read of a multi-column sidecar ({} if absent)."""
        import pyarrow.parquet as pq

        p = self.sidecar_path(snapshot, name)
        if not os.path.exists(p):
            return {}
        t = pq.read_table(p)
        return {
            c: t[c].to_numpy(zero_copy_only=False).astype(np.int64)
            for c in t.column_names
        }

    # ------------------------------------------------------------ compaction
    def compact_stage(self, snapshot: str, stage: str) -> str:
        """Fold a multi-part stage into one fresh part under this snapshot —
        explicit maintenance for long lineages.

        The exclude filter folds in ONLY when its sidecar is the clusters
        patch carry-set (``patched_cluster_docs``), whose excluded rows are
        guaranteed re-written in the newest part. Revival-bearing sidecars
        (``extinct_sig_ids``, ``dead_row_keys``) merely HIDE rows that a
        later re-add reveals in place — folding their filter would
        physically destroy state the resurrection path depends on, so those
        stages compact the raw part union and keep the exclude entry."""
        import ray.data as rd

        m0 = self.manifest(snapshot)
        ent0 = (m0 or {}).get("stages", {}).get(stage, {})
        exc0 = ent0.get("exclude")
        fold = not exc0 or exc0.get("sidecar") == "patched_cluster_docs"
        if fold:
            ds = self.read_stage(snapshot, stage)
        else:
            dirs = self.stage_dirs(snapshot, stage) or [self.stage_dir(snapshot, stage)]
            ds = rd.read_parquet(parquet_files(dirs))
        final = self.stage_dir(snapshot, stage)
        tmp = final + ".compact"
        if os.path.exists(tmp):
            import shutil

            shutil.rmtree(tmp)
        os.makedirs(tmp, exist_ok=True)
        ds.write_parquet(tmp)
        rows = ds.count()
        if os.path.exists(final):
            import shutil

            shutil.rmtree(final)
        os.replace(tmp, final)
        m = self.manifest(snapshot)
        ent = m["stages"][stage]
        ent["dirs"] = [self._rel(final)]
        ent["own"] = self._rel(final)
        if fold:
            exc = ent.pop("exclude", None)
            ent["rows"] = int(rows)
        else:
            exc = None  # exclude entry and logical row count stay as-is
        self._update_manifest(snapshot, stage_update={stage: ent})
        if exc and exc.get("sidecar") == "patched_cluster_docs":
            # the clusters churn set is purely a patch carry-set — folding the
            # parts resets it so child merges stop re-carrying compacted rows
            self.write_sidecar(snapshot, "patched_cluster_docs", np.empty(0, np.int64))
        return final

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


def write_part_sorted_index(part_dir: str, key: str, val: str) -> None:
    """Sorted binary point-lookup index for one part dir of a keyed stage:
    reads the part's parquet back, sorts by ``key`` and writes two raw
    ``.npy`` arrays (``_idx_<key>.npy`` + ``_idx_<val>.npy``). Parts are
    append-only, so an index is written once when its part is created and
    never rewritten; a merge's touched-key lookups then binary-search the
    MEMMAPPED key array and fault in only the touched pages — delta-bounded
    I/O instead of a full-part scan (the LSM point-lookup pattern). Written
    atomically; absence of either file means "fall back to the scan"
    (e.g. parts created before this index existed, or after compact_stage)."""
    import pyarrow.parquet as pq

    files = parquet_files([part_dir])
    t = (
        pq.read_table(files, columns=[key, val])
        if files
        else None
    )
    if t is None:
        return
    k = t[key].to_numpy(zero_copy_only=False).astype(np.int64)
    v = t[val].to_numpy(zero_copy_only=False).astype(np.int64)
    order = np.argsort(k, kind="stable")
    for name, arr in ((key, k[order]), (val, v[order])):
        path = os.path.join(part_dir, f"_idx_{name}.npy")
        tmp = f"{path}.tmp{os.getpid()}.npy"  # np.save appends .npy otherwise
        np.save(tmp, arr)
        os.replace(tmp, path)


def write_part_sig_index(part_dir: str) -> None:
    """Sorted point-lookup index for one SIGNATURES part: ``_idx_doc_id.npy``
    (sorted sig ids) + ``_idx_sigpl.npy`` (uint8 matrix of the verify payload
    — packed u32 minhash bytes followed by the u64 simhash — in the same
    sorted order). A merge's verify broadcast then gathers only pair
    members' rows by memmapped binary search instead of scanning every
    signature part (the dominant stored column). Same atomicity/fallback
    contract as write_part_sorted_index."""
    import pyarrow.parquet as pq

    files = parquet_files([part_dir])
    if not files:
        return
    t = pq.read_table(files, columns=["doc_id", "minhash", "simhash"])
    ids = t["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
    n = len(ids)
    mh_width = t.schema.field("minhash").type.byte_width
    if n:
        arr = t["minhash"].combine_chunks()
        mh = np.frombuffer(
            arr.buffers()[-1],
            dtype=np.uint8,
            count=n * mh_width,
            offset=arr.offset * mh_width,
        ).reshape(n, mh_width)
    else:
        mh = np.empty((0, mh_width), np.uint8)
    sim = t["simhash"].to_numpy(zero_copy_only=False).astype(np.int64)
    payload = np.concatenate(
        [mh, sim.view(np.uint8).reshape(n, 8)], axis=1
    ) if n else np.empty((0, mh_width + 8), np.uint8)
    order = np.argsort(ids, kind="stable")
    for name, arr in (("doc_id", ids[order]), ("sigpl", payload[order])):
        path = os.path.join(part_dir, f"_idx_{name}.npy")
        tmp = f"{path}.tmp{os.getpid()}.npy"
        np.save(tmp, arr)
        os.replace(tmp, path)


def write_part_meta_index(part_dir: str) -> None:
    """Sorted point-lookup index for one DOCS_META part: ``_idx_doc_id.npy``
    (sorted url-hash doc ids) + ``_idx_combo.npy`` / ``_idx_sig.npy`` (the
    derived (url, content) combo key and content sig id in the same sorted
    order). A merge's new/modified delta classification (reference M10,
    improved_faiss_detector.py:269-295) then binary-searches the MEMMAPPED
    id array for just the delta's urls instead of scanning every stored
    meta row — the classification becomes delta-bounded. Same
    atomicity/fallback contract as write_part_sorted_index."""
    import pyarrow.parquet as pq

    from imagededupx_ray.stages.dedup import doc_sig_combo, sig_ids_from_sha

    files = parquet_files([part_dir])
    if not files:
        return
    t = pq.read_table(files, columns=["doc_id", "text_sha256"])
    ids = t["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
    combo = doc_sig_combo(t)
    sig = sig_ids_from_sha(t["text_sha256"])
    order = np.argsort(ids, kind="stable")
    for name, arr in (
        ("doc_id", ids[order]),
        ("combo", combo[order]),
        ("sig", sig[order]),
    ):
        path = os.path.join(part_dir, f"_idx_{name}.npy")
        tmp = f"{path}.tmp{os.getpid()}.npy"
        np.save(tmp, arr)
        os.replace(tmp, path)


def part_sorted_index_paths(
    dirs: list[str], key: str, val: str
) -> list[tuple[str, str]] | None:
    """(key_path, val_path) per part dir, or None if ANY part lacks its
    sorted index (callers fall back to the parquet scan)."""
    out = []
    for d in dirs:
        kp = os.path.join(d, f"_idx_{key}.npy")
        vp = os.path.join(d, f"_idx_{val}.npy")
        if not (os.path.exists(kp) and os.path.exists(vp)):
            return None
        out.append((kp, vp))
    return out


def parquet_files(dirs: list[str]) -> list[str]:
    """Expand part directories into their parquet file paths — pyarrow's
    multi-path dataset factory accepts files only, not directories."""
    out: list[str] = []
    for d in dirs:
        if os.path.isdir(d):
            out.extend(
                os.path.join(d, f) for f in sorted(os.listdir(d)) if f.endswith(".parquet")
            )
        else:
            out.append(d)
    return out


def _exclude_rows(ds, columns: list[str], sorted_vals: np.ndarray):
    """Drop rows where ANY of ``columns`` matches a value in the broadcast
    sorted int64 array — vectorized searchsorted per batch, no python rows.
    The virtual column name ``doc_sig_combo`` keys on the (doc_id, sig_id)
    row-identity combo instead of a physical column."""
    import pyarrow as pa
    import ray

    ref = ray.put(np.ascontiguousarray(sorted_vals, dtype=np.int64))
    cols = list(columns)

    def fn(t: pa.Table) -> pa.Table:
        from imagededupx_ray.stages.dedup import doc_sig_combo

        vals = ray.get(ref)
        keep = np.ones(t.num_rows, dtype=bool)
        for c in cols:
            if c == "doc_sig_combo":
                x = doc_sig_combo(t)
            else:
                x = t[c].to_numpy(zero_copy_only=False).astype(np.int64)
            pos = np.searchsorted(vals, x)
            pos[pos >= len(vals)] = 0
            keep &= vals[pos] != x
        return t.filter(pa.array(keep))

    return ds.map_batches(fn, batch_format="pyarrow")
