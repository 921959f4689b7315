from pangulu_tpu.ops.interface import get_backend, KernelBackend

__all__ = ["get_backend", "KernelBackend"]
