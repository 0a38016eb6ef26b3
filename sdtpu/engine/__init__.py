"""Engine: pipeline orchestration, compiled-executable management, errors, logging."""
