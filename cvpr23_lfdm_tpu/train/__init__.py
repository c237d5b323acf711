"""Training: unified DM + LFAE trainers, losses, schedules."""
