"""Real-time market-data tools (Finnhub REST) + OpenAI function schemas.

Capability parity with reference src/utils/tools.py (get_stock_price quote
endpoint, get_ipo_info over a 730-day IPO-calendar window) and
tools_schema.json. The HTTP transport is injectable so the tool layer is
testable offline and gracefully degrades without network/API key.
"""

from __future__ import annotations

import logging
from datetime import datetime, timedelta
from typing import Callable, Dict, Optional

logger = logging.getLogger(__name__)

BASE_URL = "https://finnhub.io/api/v1"

TOOLS_SCHEMA = [
    {
        "type": "function",
        "function": {
            "name": "get_stock_price",
            "description": "Get current stock price for a given ticker symbol.",
            "parameters": {
                "type": "object",
                "properties": {
                    "ticker": {
                        "type": "string",
                        "description": "The stock ticker symbol, e.g., 'AAPL', 'ZK'",
                    }
                },
                "required": ["ticker"],
            },
        },
    },
    {
        "type": "function",
        "function": {
            "name": "get_ipo_info",
            "description": "Get IPO information for a given ticker symbol.",
            "parameters": {
                "type": "object",
                "properties": {
                    "ticker": {
                        "type": "string",
                        "description": "The stock ticker symbol, e.g., 'AAPL', 'ZK'",
                    }
                },
                "required": ["ticker"],
            },
        },
    },
]


def _default_http_get(url: str, params: Dict) -> Dict:
    import httpx

    resp = httpx.get(url, params=params, timeout=10.0)
    resp.raise_for_status()
    return resp.json()


class FinnhubTools:
    """Tool executor; ``http_get`` is injectable for offline tests."""

    def __init__(self, api_key: str = "",
                 http_get: Optional[Callable[[str, Dict], Dict]] = None) -> None:
        self.api_key = api_key
        self.http_get = http_get or _default_http_get

    # -- tool: quote ------------------------------------------------------
    def get_stock_price(self, ticker: str = "ZK") -> dict:
        if not ticker:
            return {"error": "Ticker symbol cannot be empty."}
        if not self.api_key and self.http_get is _default_http_get:
            return {"error": "Market data is not configured."}
        try:
            data = self.http_get(f"{BASE_URL}/quote",
                                 {"symbol": ticker.upper(), "token": self.api_key})
            # falsy check also catches missing keys (an empty 200 body
            # would otherwise return a success-shaped quote of Nones)
            if not data.get("c") and not data.get("pc"):
                return {"error": f"No price data available for {ticker}."}
            return {
                "ticker": ticker.upper(),
                "currentPrice": data.get("c"),
                "previousClose": data.get("pc"),
                "change": data.get("d"),
                "percentChange": data.get("dp"),
            }
        except Exception as e:  # bounded failure -> structured error
            logger.error("Error fetching stock price: %s", e)
            return {"error": f"An unexpected error occurred: {e}"}

    # -- tool: IPO calendar -------------------------------------------------
    def get_ipo_info(self, ticker: str = "ZK") -> dict:
        if not ticker:
            return {"error": "Ticker symbol cannot be empty."}
        if not self.api_key and self.http_get is _default_http_get:
            return {"error": "Market data is not configured."}
        end = datetime.now()
        start = end - timedelta(days=730)
        try:
            data = self.http_get(
                f"{BASE_URL}/calendar/ipo",
                {"from": start.strftime("%Y-%m-%d"),
                 "to": end.strftime("%Y-%m-%d"), "token": self.api_key})
            calendar = data.get("ipoCalendar", [])
            if not calendar:
                return {"error": "No IPO data found in the last two years."}
            for ipo in calendar:
                if ipo.get("symbol") == ticker.upper():
                    return {
                        "companyName": ipo.get("name"),
                        "ticker": ipo.get("symbol"),
                        "ipoDate": ipo.get("date"),
                        "ipoPrice": ipo.get("price"),
                        "shares": ipo.get("numberOfShares"),
                        "exchange": ipo.get("exchange"),
                    }
            return {"error": f"IPO information for {ticker} not found."}
        except Exception as e:
            logger.error("Error fetching IPO info: %s", e)
            return {"error": f"An unexpected error occurred: {e}"}

    def registry(self) -> Dict[str, Callable[..., dict]]:
        return {"get_stock_price": self.get_stock_price,
                "get_ipo_info": self.get_ipo_info}
