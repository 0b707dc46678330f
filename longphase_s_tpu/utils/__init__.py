from .timers import StageTimer, stage
