from tooncrafter_tpu.ops import schedule  # noqa: F401
