from hdrtv_tpu.runtime.processor import HDRTVNetTPU  # noqa: F401
