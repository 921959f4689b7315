from pangulu_tpu.io.mmio import read_matrix, read_rhs, write_matrix

__all__ = ["read_matrix", "read_rhs", "write_matrix"]
