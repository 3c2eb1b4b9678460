"""reports_monitor module — aggregate spotting-network reports
(PSKreporter, WSPRnet, RBN).

reference: misc_modules/reports_monitor/src/main.cpp — per-service
connectors feed a deduplicated report list (:434-470) shown with a
"RPTS: NNN" status.  The RBN telnet connector is implemented
(utils/reports.py); PSKreporter (MQTT) and WSPRnet (HTTP) need egress
and accept injected reports through the same addReport path.
"""

from __future__ import annotations

from typing import Optional

from ..app import ModuleInstance
from ..utils.reports import (Report, ReportAggregator, RBNClient,
                             RS_RBN, parse_rbn_line)


class ReportsMonitorModule(ModuleInstance):
    def __init__(self, name: str, app, callsign: str = "",
                 rbn_host: str = "telnet.reversebeacon.net",
                 rbn_port: int = 7000, autostart_rbn: bool = False):
        super().__init__(name)
        self.app = app
        self.callsign = callsign
        self.rbn_host, self.rbn_port = rbn_host, int(rbn_port)
        self.aggregator = ReportAggregator()
        self.rbn: Optional[RBNClient] = None
        if autostart_rbn:
            self.start_rbn()

    def module_type(self) -> str:
        return "reports_monitor"

    def start_rbn(self):
        if self.rbn is not None:
            return
        self.rbn = RBNClient(self.callsign, self.aggregator.add,
                             host=self.rbn_host, port=self.rbn_port,
                             spot_filter=self.callsign)
        self.rbn.start()

    def stop_rbn(self):
        if self.rbn is not None:
            self.rbn.stop()
            self.rbn = None

    def shutdown(self):
        self.stop_rbn()

    def handle_debug_command(self, cmd: str, args: str) -> dict:
        if cmd == "status":
            return {"status": self.aggregator.status(),
                    "rbn": self.rbn.status if self.rbn else "off",
                    "count": len(self.aggregator.reports)}
        if cmd == "reports":
            n = 20
            try:
                n = int(args) if args.strip() else 20
            except ValueError:
                pass
            return {"reports": [r.to_string() for r in
                                self.aggregator.snapshot(n)]}
        if cmd == "start_rbn":
            self.start_rbn()
            return {"status": "ok"}
        if cmd == "stop_rbn":
            self.stop_rbn()
            return {"status": "ok"}
        if cmd == "set_callsign":
            self.callsign = args.strip().upper()
            return {"status": "ok", "callsign": self.callsign}
        if cmd == "inject":
            # test/automation hook: feed a raw RBN line through the
            # same parse+dedup path the telnet connector uses
            rep = parse_rbn_line(args)
            if rep is None:
                return {"error": "unparsable RBN line"}
            return {"added": self.aggregator.add(rep)}
        return super().handle_debug_command(cmd, args)
