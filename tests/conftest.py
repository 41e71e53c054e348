"""Session-scoped Ray init (one cluster for the whole pytest run)."""

from __future__ import annotations

import pytest


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
    import ray.data

    ctx = ray.data.DataContext.get_current()
    ctx.enable_progress_bars = False
    ctx.execution_options.verbose_progress = False
    yield
    ray.shutdown()


@pytest.fixture(scope="session")
def tiny_corpus():
    from hsearch_ray.corpus import generate_corpus

    return generate_corpus(n_files=200, seed=42)


@pytest.fixture(scope="session")
def small_corpus():
    from hsearch_ray.corpus import generate_corpus

    return generate_corpus(n_files=600, seed=7, hot_bucket_size=60)
