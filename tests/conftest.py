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
    import ray.data

    ctx = ray.data.DataContext.get_current()
    ctx.enable_progress_bars = False
    ctx.execution_options.verbose_progress = False
    yield
    ray.shutdown()


@pytest.fixture(scope="session")
def t1_dir():
    from legislation_scraper_ray.sources.corpus import generate

    return generate("t1")


@pytest.fixture(scope="session")
def t2_dir():
    from legislation_scraper_ray.sources.corpus import generate

    return generate("t2")
