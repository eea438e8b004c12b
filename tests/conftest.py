import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


@pytest.fixture(scope="session")
def ray_session():
    import ray

    if not ray.is_initialized():
        ray.init(
            address="local",
            num_cpus=4,
            include_dashboard=False,
            ignore_reinit_error=True,
            logging_level="ERROR",
        )
    from ray.data import DataContext

    ctx = DataContext.get_current()
    ctx.enable_progress_bars = False
    ctx.execution_options.verbose_progress = False
    yield
    ray.shutdown()


@pytest.fixture(scope="session")
def fixture_corpus(tmp_path_factory):
    """Shared small synthetic pages corpus on disk (pages/, truth sidecars)."""
    from imagededupx_ray.sources.synthetic import write_pages_corpus

    out = str(tmp_path_factory.mktemp("corpus"))
    return write_pages_corpus(out, n_pages=1200, seed=42, with_truth=True)
