"""cudf.errors parity (reference python/cudf/cudf/errors.py). The
reference's errors are GPU-setup probes; the engine's analog is a
missing/failed SparkSession."""


class UnSupportedGPUError(Exception):
    """Reference raises this from validate_setup() on an unusable GPU;
    retained so `except cudf.errors.UnSupportedGPUError` call sites
    compile. Never raised here — validate_setup() is a no-op."""


class UnSupportedCUDAError(Exception):
    """See UnSupportedGPUError."""
