"""Transient-fault resilience: at 100 TB on a real cluster, workers get
preempted and tasks die mid-run; Ray retries them. These gates prove the
stages are SAFE to retry — re-running a batch task yields the same rows
(content-derived ids, no hidden per-task state), so a retried pipeline is
byte-identical to an undisturbed one.

Fault injection uses a named counter actor that tells exactly N task
attempts to raise; `retry_exceptions` on the stage's ray remote args makes
Ray re-execute those tasks (the same machinery that handles worker loss,
minus killing the shared test session's workers).
"""

import numpy as np
import pandas as pd
import pytest
import ray
import ray.data as rd


class InjectedFault(RuntimeError):
    pass


@ray.remote
class _ChaosCounter:
    """Grants exactly ``n_faults`` failure tickets across all tasks."""

    def __init__(self, n_faults: int):
        self.left = n_faults
        self.granted = 0

    def should_fail(self) -> bool:
        if self.left > 0:
            self.left -= 1
            self.granted += 1
            return True
        return False

    def faults_granted(self) -> int:
        return self.granted


def _norm(df: pd.DataFrame) -> pd.DataFrame:
    return df.sort_values(list(df.columns), kind="mergesort").reset_index(
        drop=True
    )


def test_extract_stage_identical_after_injected_task_faults(
    ray_session, fixture_corpus
):
    from imagededupx_ray.stages.extract import extract_batch

    pages = f"{fixture_corpus}/pages"
    clean = _norm(
        rd.read_parquet(pages)
        .map_batches(extract_batch, batch_format="pyarrow", batch_size=256)
        .to_pandas()
    )

    chaos = _ChaosCounter.remote(3)

    def flaky_extract(batch):
        if ray.get(chaos.should_fail.remote()):
            raise InjectedFault("simulated preempted worker")
        return extract_batch(batch)

    faulted = _norm(
        rd.read_parquet(pages)
        .map_batches(
            flaky_extract,
            batch_format="pyarrow",
            batch_size=256,
            retry_exceptions=[InjectedFault],
            max_retries=5,
        )
        .to_pandas()
    )
    assert ray.get(chaos.faults_granted.remote()) == 3  # faults really fired
    pd.testing.assert_frame_equal(clean, faulted)


def test_signature_stage_identical_after_injected_task_faults(
    ray_session, fixture_corpus
):
    """Signatures are pure functions of text: a retried signing task emits
    bit-identical minhash/simhash rows, so candidate pairs and clusters
    downstream cannot drift under retries."""
    from imagededupx_ray.config import DEFAULT_CONFIG
    from imagededupx_ray.stages.extract import extract_batch
    from imagededupx_ray.stages.signatures import _signature_task

    docs = (
        rd.read_parquet(f"{fixture_corpus}/pages")
        .map_batches(extract_batch, batch_format="pyarrow", batch_size=256)
        .materialize()
    )

    sign = _signature_task(DEFAULT_CONFIG)

    def summarize(df: pd.DataFrame) -> pd.DataFrame:
        out = pd.DataFrame(
            {
                "doc_id": df["doc_id"],
                "simhash": df["simhash"],
                "mh0": [np.asarray(m)[0] for m in df["minhash"]],
                "mh_sum": [int(np.asarray(m).sum()) for m in df["minhash"]],
            }
        )
        return _norm(out)

    clean = summarize(
        docs.map_batches(sign, batch_format="pyarrow", batch_size=256).to_pandas()
    )

    chaos = _ChaosCounter.remote(2)

    def flaky_sign(batch):
        if ray.get(chaos.should_fail.remote()):
            raise InjectedFault("simulated preempted worker")
        return sign(batch)

    faulted = summarize(
        docs.map_batches(
            flaky_sign,
            batch_format="pyarrow",
            batch_size=256,
            retry_exceptions=[InjectedFault],
            max_retries=5,
        ).to_pandas()
    )
    assert ray.get(chaos.faults_granted.remote()) == 2
    pd.testing.assert_frame_equal(clean, faulted)


def test_unretried_fault_fails_loudly(ray_session, fixture_corpus):
    """Without retry_exceptions the injected fault must surface, not be
    silently swallowed or rows dropped (max_errored_blocks defaults to 0)."""
    chaos = _ChaosCounter.remote(1)

    def flaky(batch):
        if ray.get(chaos.should_fail.remote()):
            raise InjectedFault("boom")
        return batch

    ds = rd.read_parquet(f"{fixture_corpus}/pages").map_batches(
        flaky, batch_format="pyarrow", batch_size=256
    )
    with pytest.raises(Exception):
        ds.count()
