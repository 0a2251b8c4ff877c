import numpy as np
import pytest


@pytest.fixture(scope="session")
def ray_session():
    import ray

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
    yield ray
    ray.shutdown()


@pytest.fixture(scope="session")
def uniform_1m():
    rng = np.random.default_rng(42)
    return rng.uniform(0.0, 1001.0, 1_000_000)


@pytest.fixture(scope="session")
def transcripts_dir():
    from approximate_quantiles_ray.sources.transcripts import ensure_transcripts

    return ensure_transcripts(10_000, seed=42)


SF_DIR = "/root/testdata/sf0.001"
