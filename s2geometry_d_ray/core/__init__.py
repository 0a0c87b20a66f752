"""Pure-NumPy S2 math kernels. No Ray imports anywhere in this subpackage."""
