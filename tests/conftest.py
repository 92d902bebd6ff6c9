"""Session-scoped Ray + shared fixtures (one ray.init per pytest run)."""

import pytest


@pytest.fixture(scope="session")
def ray_session():
    import logging

    import ray
    import ray.data

    ray.init(
        address="local",
        num_cpus=4,
        include_dashboard=False,
        ignore_reinit_error=True,
        logging_level="ERROR",
    )
    ctx = ray.data.DataContext.get_current()
    ctx.enable_progress_bars = False
    logging.getLogger("ray.data").setLevel(logging.ERROR)
    yield
    ray.shutdown()


@pytest.fixture(scope="session")
def caltrain_dir(tmp_path_factory):
    from geotile.synth import make_caltrain_fixture

    return make_caltrain_fixture(tmp_path_factory.mktemp("caltrain"))


@pytest.fixture(scope="session")
def image_table_dir(tmp_path_factory):
    from geotile.synth import make_image_table

    return make_image_table(2000, tmp_path_factory.mktemp("img") / "images")
