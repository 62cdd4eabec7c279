"""G3 — config-driven table fan-out (constants.yaml shape).

The reference's constants.yaml drives which tables exist: collection
groups with items, query-param templates, and the 8 instrument types
(constants.yaml:3-105). The engine reads the same shape (from YAML when
available, else the embedded default mirroring the reference's
structure) and exposes the fan-out iterator the pipelines loop over
(mabna_tables_create.py:80-90).
"""

from __future__ import annotations

from collections.abc import Iterator
from dataclasses import dataclass

DEFAULT_CONFIG: dict = {
    "url": "https://example.invalid/api",  # reference: constants.yaml:1 (real API not used here)
    "instrument_types": [
        "share", "bond", "future", "intellectual_property",
        "energy", "commodity", "currency", "crypto",
    ],
    "collections": {
        # the reference's FULL collection inventory (constants.yaml:21-105):
        # 7 groups; exchange carries 32 items, stock 28; `trades` fans out
        # ×8 instrument types → ~78 source tables total. NOTE: `assets`
        # is deliberately NOT in this list, mirroring the reference —
        # src_exchange_assets is built by a dedicated task with array
        # unnesting (mabna_tables_create.py:92-127; here
        # plans.pipeline.stage_assets), so wire its extractor explicitly
        # alongside the fan-out (run_full_refresh fails soft with a
        # missing-dimension RunResult if it is absent).
        "bond": ["bonds", "bondauthoritytypes", "interestpayments"],
        "broker": ["brokers"],
        "calendar": ["occasiontypes", "dates", "calendars"],
        "option": ["contracts", "contracthistory", "contractstyles"],
        "exchange": [
            "news", "persons", "gendertypes", "assettypes", "assetstates",
            "instrumentexchangestates", "instrumentgroupstatetypes",
            "exchanges", "boards", "indexinstrumenteffects", "reportimages",
            "reporttitles", "instrumentbasevolumes", "categories",
            "assetcategories", "reportsubtitles", "indexes", "indexvalues",
            "markets", "trades", "sources", "reportsources", "instruments",
            "indexinstruments", "instrumentstates", "instrumentgroupstates",
            "percentageactiontypes", "percentagedealertypes", "percentages",
            "percentagevalues", "percentagegroups", "instrumentgroups",
        ],
        "fund": ["funds"],
        "stock": [
            "epses", "companycontactinfos", "boardofdirectorsitems",
            "boardofdirectors", "companycontactinfotypes", "meetingtypes",
            "capitalchanges", "productionsaleitems", "productionsales",
            "companycategories", "freefloats", "shareholdersitems",
            "shareholders", "profitlossitems", "profitlossfields",
            "profitlosses", "companies", "meetinginvites", "meetings",
            "products", "positions", "directortypes", "units",
            "companystates", "dividendpayouts", "cashflowitems",
            "cashflowfields", "cashflows",
        ],
    },
    "params": {"_size": 500},
}


@dataclass(frozen=True)
class TableSpec:
    title: str
    item: str
    instrument_type: str | None = None

    @property
    def name(self) -> str:
        suffix = f"_{self.instrument_type}" if self.instrument_type else ""
        return f"{self.title}_{self.item}{suffix}"


def load_config(path: str | None = None) -> dict:
    if path:
        try:
            import yaml  # type: ignore

            with open(path) as fh:
                return yaml.safe_load(fh)
        except ImportError:
            pass
    return DEFAULT_CONFIG


def fan_out(config: dict | None = None) -> Iterator[TableSpec]:
    """The reference's nested loop (mabna_tables_create.py:80-90):
    every (title, item) pair; ``trades`` expands ×8 instrument types."""
    cfg = config or DEFAULT_CONFIG
    for title, items in cfg["collections"].items():
        for item in items:
            if item == "trades":
                for t in cfg["instrument_types"]:
                    yield TableSpec(title, item, t)
            else:
                yield TableSpec(title, item)
