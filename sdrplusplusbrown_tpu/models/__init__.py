from .rx_vfo import RxVFO
from .radio import Radio, DEMOD_NAMES, DEMOD_IDS, DEMOD_IF_RATES
