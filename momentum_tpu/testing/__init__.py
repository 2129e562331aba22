from momentum_tpu.testing.fixtures import create_test_character  # noqa: F401
