from veritasfi_tpu.serving.tools import TOOLS_SCHEMA, FinnhubTools


def fake_http(responses):
    def get(url, params):
        for key, value in responses.items():
            if key in url:
                return value
        raise RuntimeError("unexpected url " + url)
    return get


def test_schema_shape():
    names = {t["function"]["name"] for t in TOOLS_SCHEMA}
    assert names == {"get_stock_price", "get_ipo_info"}
    for t in TOOLS_SCHEMA:
        assert t["function"]["parameters"]["required"] == ["ticker"]


def test_stock_price():
    tools = FinnhubTools(api_key="k", http_get=fake_http({
        "/quote": {"c": 25.5, "pc": 24.0, "d": 1.5, "dp": 6.25}}))
    out = tools.get_stock_price("zk")
    assert out == {"ticker": "ZK", "currentPrice": 25.5,
                   "previousClose": 24.0, "change": 1.5,
                   "percentChange": 6.25}


def test_stock_price_no_data():
    tools = FinnhubTools(api_key="k", http_get=fake_http({
        "/quote": {"c": 0, "pc": 0}}))
    assert "error" in tools.get_stock_price("ZK")


def test_ipo_info_found_and_missing():
    cal = {"ipoCalendar": [
        {"symbol": "ZK", "name": "Zeekr", "date": "2024-05-10",
         "price": "21", "numberOfShares": 21000000, "exchange": "NYSE"}]}
    tools = FinnhubTools(api_key="k", http_get=fake_http({"/calendar": cal}))
    out = tools.get_ipo_info("zk")
    assert out["companyName"] == "Zeekr" and out["ipoDate"] == "2024-05-10"
    assert "error" in tools.get_ipo_info("LOT")


def test_empty_ticker_and_unconfigured():
    tools = FinnhubTools()
    assert "error" in tools.get_stock_price("")
    assert "error" in tools.get_stock_price("ZK")  # no api key, no injected http
    assert "error" in tools.get_ipo_info("ZK")


def test_http_error_contained():
    def boom(url, params):
        raise RuntimeError("network down")
    tools = FinnhubTools(api_key="k", http_get=boom)
    assert "error" in tools.get_stock_price("ZK")
    assert "error" in tools.get_ipo_info("ZK")


def test_registry():
    tools = FinnhubTools()
    assert set(tools.registry()) == {"get_stock_price", "get_ipo_info"}


def test_quote_empty_body_is_error():
    from veritasfi_tpu.serving.tools import FinnhubTools

    tools = FinnhubTools("key", http_get=lambda url, params: {})
    out = tools.get_stock_price("AAPL")
    assert "error" in out and "currentPrice" not in out
