from super_tpu.runtime.loader import NativeSequenceLoader, native_available  # noqa: F401
