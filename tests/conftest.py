import os

import pytest

FIXTURES = os.path.join(os.path.dirname(__file__), "fixtures")
KANT = os.path.join(FIXTURES, "kant_aufklaerung_1784_0020.xml")
METS = os.path.join(FIXTURES, "mets.xml")


@pytest.fixture(scope="session")
def ray_session():
    """One Ray session for the whole pytest run (driver contract)."""
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
    yield
    ray.shutdown()


@pytest.fixture(scope="session")
def kant_bytes():
    with open(KANT, "rb") as f:
        return f.read()


@pytest.fixture(scope="session")
def mets_bytes():
    with open(METS, "rb") as f:
        return f.read()
