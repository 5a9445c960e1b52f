"""L7 command-line entry points."""
