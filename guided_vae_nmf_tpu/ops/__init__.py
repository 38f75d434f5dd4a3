from .profiling import StageTimer, profile_trace, stage
