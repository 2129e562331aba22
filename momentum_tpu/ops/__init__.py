from momentum_tpu.ops.fk_pallas import fk_pallas, fk_pallas_available  # noqa: F401
