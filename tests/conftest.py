import os
import tempfile

import pytest
import ray


@pytest.fixture(scope="session", autouse=True)
def ray_session():
    ray.init(address="local", num_cpus=4, include_dashboard=False,
             ignore_reinit_error=True, logging_level="ERROR")
    from ray.data import DataContext
    DataContext.get_current().enable_progress_bars = False
    yield
    ray.shutdown()


@pytest.fixture(scope="session")
def tiny_pages():
    from guacray.data.pages import generate_pages
    return generate_pages(64)


@pytest.fixture(scope="session")
def small_pages():
    from guacray.data.pages import generate_pages
    return generate_pages(256)


@pytest.fixture(scope="session")
def small_pages_path(small_pages, tmp_path_factory):
    import pyarrow.parquet as pq
    d = tmp_path_factory.mktemp("pages")
    p = str(d / "pages.parquet")
    pq.write_table(small_pages, p)
    return p
