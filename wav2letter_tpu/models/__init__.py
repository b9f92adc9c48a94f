from .arch import (
    ArchModel,
    ArchSequential,
    build_arch_from_lines,
    build_arch_module,
    parse_arch_file,
)

__all__ = [
    "build_arch_module",
    "build_arch_from_lines",
    "parse_arch_file",
    "ArchModel",
    "ArchSequential",
]
