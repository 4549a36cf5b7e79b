"""Deterministic synthetic company panel (seed-free: pure arithmetic).

Produces company-facts + submissions JSON in the exact shape the
reference consumes via --facts (select_xbrl_tags.py:2761-2785), so the
reference script itself can be run as the golden oracle, and the same
files feed our Spark reader. All dict keys are inserted in sorted order
so the reference's dict-iteration-order behaviors are deterministic.

The panel exercises every selection path: multi-candidate competition,
sector gating, widen ladders, fp/qtrs passes, segment penalties,
EPS/COGS/TotalDebt fallbacks, direct-growth tags (ratio, percent and
absolute-delta variants), and the anchor-overlap quirk where a fy-1
selection picks the fy record (smart_pick tie -> later end,
select_xbrl_tags.py:1515-1520).
"""

from __future__ import annotations

import json
import pathlib
from datetime import date, timedelta

from ..vocab.sic import sic_to_sector

FY = 2024

# (symbol, cik, name, sic, sic_description, fye)
PANEL_COMPANIES = [
    ("ALPH", 100001, "Alpha Systems Inc.", 7372, "Services-Prepackaged Software", "1231"),
    ("BETA", 100002, "Beta Networks Corp.", 7371, "Services-Computer Programming", "1231"),
    ("GAMA", 100003, "Gamma Holdings PLC", 6022, "State Commercial Banks", "1231"),
    ("DLTA", 100004, "Delta Power & Light", 4911, "Electric Services", "0930"),
    ("EPSL", 100005, "Epsilon Health Systems", 8062, "General Medical Hospitals", "1231"),
    ("ZETA", 100006, "Zeta Retail Group", 5311, "Department Stores", "0131"),
    ("ETAC", 100007, "Eta Energy Corp.", 1311, "Crude Petroleum & Natural Gas", "1231"),
    ("THTA", 100008, "Theta Beverages Inc.", 2086, "Bottled & Canned Soft Drinks", "0630"),
    ("IOTA", 100009, "Iota Media Group", 4813, "Telephone Communications", "1231"),
    ("KPPA", 100010, "Kappa Industrial Works", 3571, "Electronic Computers", "1231"),
    ("LMDA", 100011, "Lambda Dining Corp.", 5812, "Eating Places", "1231"),
    ("MUCO", 100012, "Mu Publishing House", 2731, "Books: Publishing", "1231"),
]

# Per-metric magnitude factors (millions), duration metrics.
DUR_FACTORS = {
    "Revenue": 1000, "CostOfGoodsSold": 600, "GrossProfit": 400,
    "OperatingIncome": 250, "NetIncome": 180, "CFO": 260, "CapEx": 80,
    "InterestExpense": 20, "DepAmort": 60, "IncomeTaxExpense": 45,
    "PreTaxIncome": 225, "DilutedShares": 10,
}
INST_FACTORS = {
    "Assets": 2000, "Liabilities": 1200, "Equity": 800, "LongTermDebt": 500,
    "ShortTermDebt": 100, "DebtCurrent": 90, "CurrentAssets": 700,
    "CurrentLiabilities": 350, "Inventories": 150, "AccountsReceivable": 120,
    "CashAndCashEquivalents": 300,
}

# Primary QName used per metric in the synthetic filings.
PRIMARY_QNAME = {
    "Revenue": "us-gaap:RevenueFromContractWithCustomerExcludingAssessedTax",
    "CostOfGoodsSold": "us-gaap:CostOfGoodsSold",
    "GrossProfit": "us-gaap:GrossProfit",
    "OperatingIncome": "us-gaap:OperatingIncomeLoss",
    "NetIncome": "us-gaap:NetIncomeLoss",
    "CFO": "us-gaap:NetCashProvidedByUsedInOperatingActivities",
    "CapEx": "us-gaap:PaymentsToAcquirePropertyPlantAndEquipment",
    "InterestExpense": "us-gaap:InterestExpense",
    "DepAmort": "us-gaap:DepreciationAndAmortization",
    "IncomeTaxExpense": "us-gaap:IncomeTaxExpenseBenefit",
    "PreTaxIncome": "us-gaap:IncomeLossFromContinuingOperationsBeforeIncomeTaxesExtraordinaryItemsNoncontrollingInterest",
    "DilutedShares": "us-gaap:WeightedAverageNumberOfDilutedSharesOutstanding",
    "EPSDiluted": "us-gaap:EarningsPerShareDiluted",
    "Assets": "us-gaap:Assets",
    "Liabilities": "us-gaap:Liabilities",
    "Equity": "us-gaap:StockholdersEquityIncludingPortionAttributableToNoncontrollingInterest",
    "LongTermDebt": "us-gaap:LongTermDebtNoncurrent",
    "ShortTermDebt": "us-gaap:ShortTermBorrowings",
    "DebtCurrent": "us-gaap:DebtCurrent",
    "CurrentAssets": "us-gaap:AssetsCurrent",
    "CurrentLiabilities": "us-gaap:LiabilitiesCurrent",
    "Inventories": "us-gaap:InventoryNet",
    "AccountsReceivable": "us-gaap:AccountsReceivableNetCurrent",
    "CashAndCashEquivalents": "us-gaap:CashAndCashEquivalentsAtCarryingValue",
}


def _fye_mm_dd(fye: str) -> tuple[int, int]:
    return int(fye[:2]), int(fye[2:])


def _anchor(fy: int, fye: str) -> date:
    mm, dd = _fye_mm_dd(fye)
    return date(fy, mm, dd)


def metric_value(i: int, metric: str, fy: int) -> float:
    """Deterministic value for company i, metric, fiscal year."""
    factor = DUR_FACTORS.get(metric) or INST_FACTORS.get(metric)
    cur = float(factor * (i + 1) * 1_000_000 + i * 1_000)
    if fy == FY:
        return cur
    # prior year: distinct per-company growth, integer-exact
    return float(int(cur * (85 + i) / 100.0))


def _rec(val, end: str, fp: str, form: str, accn: str, fy: int,
         qtrs=None, segment=None, start=None, frame=None) -> dict:
    r = {"accn": accn, "end": end, "form": form, "fp": fp, "fy": fy, "val": val}
    if qtrs is not None:
        r["qtrs"] = qtrs
    if segment is not None:
        r["segment"] = segment
    if start is not None:
        r["start"] = start
    if frame is not None:
        r["frame"] = frame
    return r


def scaled_companies(n_companies: int) -> list[tuple]:
    """Deterministically extend the 12 archetypes to n companies:
    clone k inherits archetype k%12's sic/fye (so sectors & fiscal
    calendars repeat -> shared industries, realistic group sizes) with
    distinct cik/symbol/name."""
    out = []
    for k in range(n_companies):
        sym, cik, name, sic, sic_desc, fye = PANEL_COMPANIES[k % 12]
        if k < 12:
            out.append(PANEL_COMPANIES[k])
        else:
            out.append((f"{sym[:3]}{k}", 100001 + k, f"{name} Clone {k}",
                        sic, sic_desc, fye))
    return out


def build_panel(n_companies: int = 12) -> list[dict]:
    """Returns one entry per company:
    {meta, facts_json, submissions_json}."""
    out = []
    for i, (sym, cik, name, sic, sic_desc, fye) in enumerate(
            scaled_companies(n_companies)):
        a_cur = _anchor(FY, fye) if fye != "0131" else _anchor(FY + 1, fye)
        a_prv = a_cur.replace(year=a_cur.year - 1)
        accn_cur = f"{cik:010d}-24-000001"
        accn_prv = f"{cik:010d}-23-000001"
        end_cur = a_cur.isoformat()
        end_prv = a_prv.isoformat()
        if i == 9:
            # off-anchor fiscal end (dist 20) exercises distance scoring
            end_cur = (a_cur + timedelta(days=20)).isoformat()
            end_prv = (a_prv + timedelta(days=20)).isoformat()

        tags: dict[str, dict] = {}

        def put(qname: str, unit: str, recs: list[dict]):
            tax, tag = qname.split(":")
            tags.setdefault(tax, {}).setdefault(tag, {"units": {}})
            tags[tax][tag]["units"].setdefault(unit, []).extend(recs)

        # --- duration base metrics ---
        for metric in ["Revenue", "CostOfGoodsSold", "GrossProfit",
                       "OperatingIncome", "NetIncome", "CFO", "CapEx",
                       "InterestExpense", "DepAmort", "IncomeTaxExpense",
                       "PreTaxIncome", "DilutedShares"]:
            if metric == "CostOfGoodsSold" and i == 2:
                continue  # COGS fallback company
            if metric == "Revenue" and i == 10:
                continue  # sector-gated revenue company (UtilityRevenue only)
            unit = "shares" if metric == "DilutedShares" else "USD"
            qn = PRIMARY_QNAME[metric]
            cur = metric_value(i, metric, FY)
            prv = metric_value(i, metric, FY - 1)
            put(qn, unit, [
                _rec(prv, end_prv, "FY", "10-K", accn_prv, FY - 1, qtrs=4),
                _rec(cur, end_cur, "FY", "10-K", accn_cur, FY, qtrs=4),
            ])
            if metric == "Revenue":
                # 10-Q noise record (never wins the annual pass)
                q3_end = (a_cur - timedelta(days=92)).isoformat()
                put(qn, unit, [
                    _rec(round(cur * 0.24, 2), q3_end, "Q3", "10-Q",
                         accn_cur.replace("000001", "000777"), FY, qtrs=1),
                ])
            if metric == "NetIncome" and i == 11:
                # segmented duplicate AFTER the consolidated record: same
                # (score, end) -> pool order keeps the first (reference
                # smart_pick strict > , select_xbrl_tags.py:1519)
                put(qn, unit, [
                    _rec(round(cur * 0.6, 2), end_cur, "FY", "10-K",
                         accn_cur, FY, qtrs=4, segment="BusinessSegmentA"),
                ])

        # EPSDiluted: skip tags for company 1 (derived NI/shares fallback)
        if i != 1:
            ni = metric_value(i, "NetIncome", FY)
            sh = metric_value(i, "DilutedShares", FY)
            eps_cur = round(ni / sh, 2)
            eps_prv = round(metric_value(i, "NetIncome", FY - 1)
                            / metric_value(i, "DilutedShares", FY - 1), 2)
            put(PRIMARY_QNAME["EPSDiluted"], "USD/shares", [
                _rec(eps_prv, end_prv, "FY", "10-K", accn_prv, FY - 1, qtrs=4),
                _rec(eps_cur, end_cur, "FY", "10-K", accn_cur, FY, qtrs=4),
            ])

        # company 10: revenue exists only under a Utilities-gated concept
        if i == 10:
            cur = metric_value(i, "Revenue", FY)
            put("us-gaap:UtilityRevenue", "USD", [
                _rec(cur, end_cur, "FY", "10-K", accn_cur, FY, qtrs=4),
            ])

        # --- instant base metrics ---
        for metric in ["Assets", "Liabilities", "Equity", "LongTermDebt",
                       "ShortTermDebt", "DebtCurrent", "CurrentAssets",
                       "CurrentLiabilities", "Inventories",
                       "AccountsReceivable", "CashAndCashEquivalents"]:
            if metric in ("ShortTermDebt", "DebtCurrent") and i == 4:
                continue  # TotalDebt partial (LongTermDebt only)
            if metric == "Inventories" and i == 3:
                # only a 10-Q instant record -> exercises hasQuarter
                cur = metric_value(i, metric, FY)
                put(PRIMARY_QNAME[metric], "USD", [
                    _rec(cur, end_cur, "Q3", "10-Q",
                         accn_cur.replace("000001", "000778"), FY),
                ])
                continue
            qn = PRIMARY_QNAME[metric]
            cur = metric_value(i, metric, FY)
            prv = metric_value(i, metric, FY - 1)
            put(qn, "USD", [
                _rec(prv, end_prv, "FY", "10-K", accn_prv, FY - 1),
                _rec(cur, end_cur, "FY", "10-K", accn_cur, FY),
            ])

        # --- direct-growth extension tags ---
        if i == 6:
            put("ext:RevenueGrowthPercent", "percent", [
                _rec(12.5, end_cur, "FY", "10-K", accn_cur, FY, qtrs=4),
            ])
        if i == 8:
            delta = metric_value(i, "Revenue", FY) - metric_value(i, "Revenue", FY - 1)
            put("ext:ChangeInRevenue", "USD", [
                _rec(delta, end_cur, "FY", "10-K", accn_cur, FY, qtrs=4),
            ])

        # ancient noise record, outside every tolerance window
        put("us-gaap:Revenues" if i != 10 else "us-gaap:Assets", "USD", [
            _rec(1.0, "2019-03-31", "Q1", "10-Q",
                 f"{cik:010d}-19-000009", 2019, qtrs=1),
        ])

        # sort maps for deterministic dict iteration everywhere
        facts = {
            tax: {tag: {"units": dict(sorted(body["units"].items()))}
                  for tag, body in sorted(tags[tax].items())}
            for tax in sorted(tags)
        }
        facts_json = {
            "cik": cik,
            "entityName": name,
            "entityTicker": sym,
            "facts": facts,
        }
        submissions_json = {
            "cik": cik,
            "sic": str(sic),
            "sicDescription": sic_desc,
            "fiscalYearEnd": fye,
            "tickers": [sym],
        }
        meta = {
            "symbol": sym, "cik": f"{cik:010d}", "name": name,
            "sector": sic_to_sector(sic), "industry": sic_desc,
            "sic": str(sic), "sic_description": sic_desc, "fye": fye,
        }
        out.append({"meta": meta, "facts": facts_json, "subs": submissions_json})
    return out


def write_reference_inputs(outdir: str | pathlib.Path,
                           n_companies: int = 12) -> dict:
    """Write facts JSONs + submissions cache files in the layout the
    reference script expects (--facts list + --subs-cache-dir).
    Returns {'facts_paths': [...sorted by cik...], 'subs_cache_dir': str}.
    """
    from datetime import datetime

    outdir = pathlib.Path(outdir)
    facts_dir = outdir / "facts"
    subs_dir = outdir / "subs_cache"
    facts_dir.mkdir(parents=True, exist_ok=True)
    subs_dir.mkdir(parents=True, exist_ok=True)
    from datetime import timedelta

    # the reference resolves its submissions cache by TODAY'S date at
    # ITS OWN runtime (select_xbrl_tags cache naming) — write the file
    # under today's AND tomorrow's date so a test session spanning
    # midnight still hits the cache (observed flake: a suite started
    # 23:5x failed its reference-subprocess parity cases after 00:00)
    now = datetime.now()
    dates = [now.strftime("%Y%m%d"),
             (now + timedelta(days=1)).strftime("%Y%m%d")]
    facts_paths = []
    for entry in build_panel(n_companies):
        cik10 = f"{entry['facts']['cik']:010d}"
        fp = facts_dir / f"CIK{cik10}.json"
        fp.write_text(json.dumps(entry["facts"], ensure_ascii=False, indent=1))
        facts_paths.append(str(fp))
        subs_text = json.dumps(entry["subs"], ensure_ascii=False, indent=1)
        for d in dates:
            sp = subs_dir / f"submissions_CIK{cik10}_{d}.json"
            sp.write_text(subs_text)
    return {"facts_paths": sorted(facts_paths), "subs_cache_dir": str(subs_dir)}
