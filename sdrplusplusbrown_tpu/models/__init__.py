from .rx_vfo import RxVFO
from .radio import (Radio, DEMOD_NAMES, DEMOD_IDS, DEMOD_IF_RATES,
                    register_demod_provider, list_demods)
from .radio_bank import RadioBank, VFOSpec
from .iq_frontend import IQFrontEnd
from .waterfall import Waterfall
from .rds import RDSDemod, RDSDecoder
from .trx import Transmitter, LoopbackTransmitter, TxChain
from .pocsag import POCSAGDecoder
