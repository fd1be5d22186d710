import pytest
import ray


@pytest.fixture(scope="session", autouse=True)
def ray_session():
    """One Ray session for the whole pytest run (SURVEY.md §B / task contract)."""
    ray.init(
        address="local",
        num_cpus=4,
        include_dashboard=False,
        ignore_reinit_error=True,
        logging_level="ERROR",
    )
    from graphx_ray.context import ensure_hash_shuffle

    ctx = ray.data.DataContext.get_current()
    ctx.enable_progress_bars = False
    ensure_hash_shuffle()
    yield
    ray.shutdown()
