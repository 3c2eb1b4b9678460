"""App-level plugin modules (the analog of the reference's misc_modules)."""

from .scanner import ScannerModule
from .frequency_manager import FrequencyManagerModule
from .recorder_module import RecorderModule
from .signal_detector_module import SignalDetectorModule
from .scheduler import SchedulerModule
from .iq_exporter import IQExporterModule
from .ft8_module import FT8DecoderModule

__all__ = ["ScannerModule", "FrequencyManagerModule", "RecorderModule", "SignalDetectorModule", "SchedulerModule", "IQExporterModule", "FT8DecoderModule"]
