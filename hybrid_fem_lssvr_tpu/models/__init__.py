"""Problem definitions and hybrid-solver orchestration."""
