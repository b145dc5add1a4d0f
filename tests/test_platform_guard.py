"""Guard: the suite must run on the virtual 8-device CPU platform (SURVEY.md §4.2),
not the axon TPU tunnel — conftest.py pins jax_platforms before first device use."""


def test_platform_is_8_device_cpu():
    import jax

    devices = jax.devices()
    assert devices[0].platform == "cpu", devices
    assert len(devices) == 8, devices
