"""L6/L7: frame codec orchestration, sequence driver, CLI."""
