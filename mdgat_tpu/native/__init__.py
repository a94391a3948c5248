from mdgat_tpu.native.loader import NativeLoader, native_available
