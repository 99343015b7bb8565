from .native import gather_normalize, get_lib, native_available, normalize_u8

__all__ = ["gather_normalize", "normalize_u8", "native_available", "get_lib"]
