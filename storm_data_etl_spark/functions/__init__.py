"""Column-expression libraries (pure functions: Column in → Column out)."""
