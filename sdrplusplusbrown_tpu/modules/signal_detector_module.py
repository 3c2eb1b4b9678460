"""Signal detector module — exposes carrier detections over the control
plane (reference: core/src/dsp/detector/signal_detector.{h,cpp} registered
as an IQFrontEnd preprocessor; e2e target tests/signal_detection_test.cpp).
"""

from __future__ import annotations

from ..app import ModuleInstance
from ..ops.detector import SignalDetector


class SignalDetectorModule(ModuleInstance):
    def __init__(self, name: str, app, margin_db: float = 6.0):
        super().__init__(name)
        self.app = app
        self.detector = SignalDetector(app.frontend.effective_sr, margin_db)
        app.spectrum_event.bind(self.detector.push_spectrum)

    def module_type(self) -> str:
        return "signal_detector"

    def handle_debug_command(self, cmd: str, args: str) -> dict:
        if cmd == "detections":
            return {"detections": self.detector.detections}
        if cmd == "is_active":
            try:
                freq, bw = (float(v) for v in args.split(","))
            except ValueError:
                return {"error": f"expected 'freq,bw', got '{args}'"}
            return {"active": self.detector.is_active(freq, bw)}
        if cmd == "set_margin":
            try:
                self.detector.margin_db = float(args)
                return {"status": "ok"}
            except ValueError:
                return {"error": f"bad margin '{args}'"}
        return super().handle_debug_command(cmd, args)
