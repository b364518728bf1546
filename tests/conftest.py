import pytest
import ray

from kettleray import configure_ray_data


@pytest.fixture(scope="session", autouse=True)
def ray_session():
    ray.init(address="local", num_cpus=4, include_dashboard=False,
             ignore_reinit_error=True, logging_level="ERROR")
    configure_ray_data()
    yield
    ray.shutdown()
