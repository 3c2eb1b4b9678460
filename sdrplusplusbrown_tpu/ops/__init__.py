from . import windows, taps  # design-time (numpy)
