package graft.model

import java.sql.Timestamp

import org.apache.spark.sql.types._

/** Domain model of the engine — the two finance time-series the reference
  * ingests, plus their normalized sink-table shapes.
  *
  * Wire schemas mirror the reference's hand-declared StructTypes
  * (reference: scripts/spark_streaming_processing/yfinance_processing.py:16-27
  * and finnhub_processing.py:17-23); normalized shapes mirror the Cassandra
  * DDL (dags/ingestion_yfinance_data_to_cassandra_db.py:122-137,
  * dags/ingestion_finnhub_data_to_cassandra_db.py:122-132).
  */
object Models {

  /** One 1-minute OHLCV bar as it appears on the wire (JSON over Kafka).
    * Two field names contain spaces on the wire ("Adj Close",
    * "Stock Splits") — represented only in [[barWireSchema]]; the case class
    * models the normalized form.
    */
  final case class Bar(
      id: String,
      datetime: Timestamp,
      open: Float,
      high: Float,
      low: Float,
      close: Float,
      adj_close: Float,
      volume: Int,
      dividends: Float,
      stock_splits: Float,
      ticker: String)

  /** One tick trade (normalized). `datetime` derives from the wire's epoch-ms
    * long via `timestamp_millis` (exact; the reference's `from_unixtime`
    * variant is seconds-resolution — SURVEY §2.2 P8).
    */
  final case class Trade(
      id: String,
      trade_conditions: Seq[String],
      last_price: Float,
      symbol: String,
      datetime: Timestamp,
      volume: Int)

  /** Wire schema of a yfinance OHLCV JSON message
    * (yfinance_processing.py:16-27). All nullable, two space-y names.
    */
  val barWireSchema: StructType = StructType(Seq(
    StructField("Datetime", TimestampType),
    StructField("Open", FloatType),
    StructField("High", FloatType),
    StructField("Low", FloatType),
    StructField("Close", FloatType),
    StructField("Adj Close", FloatType),
    StructField("Volume", IntegerType),
    StructField("Dividends", FloatType),
    StructField("Stock Splits", FloatType),
    StructField("ticker", StringType)))

  /** Wire schema of a Finnhub trade JSON message
    * (finnhub_processing.py:17-23). `t` is epoch milliseconds.
    */
  val tradeWireSchema: StructType = StructType(Seq(
    StructField("c", ArrayType(StringType)),
    StructField("p", FloatType),
    StructField("s", StringType),
    StructField("t", LongType),
    StructField("v", IntegerType)))

  /** The reference's 100-ticker universe
    * (scripts/constant/stock_code_constant.py:1-14) — the seed dimension for
    * membership predicates (SURVEY §2.2 P6) and dim joins (§2.3 J3).
    */
  val tickerUniverse: Seq[String] = Seq(
    "AAPL", "MSFT", "GOOGL", "AMZN", "NVDA", "META", "TSLA", "BRK-B", "V",
    "JNJ", "WMT", "JPM", "MA", "PG", "UNH", "DIS", "HD", "BAC", "XOM",
    "PFE", "KO", "CSCO", "PEP", "ADBE", "CMCSA", "NFLX", "ABT", "CRM",
    "ACN", "NKE", "TMO", "AVGO", "COST", "MCD", "DHR", "TXN", "NEE",
    "WFC", "LIN", "AMD", "PM", "UNP", "BMY", "LOW", "HON", "ORCL", "QCOM",
    "UPS", "INTC", "IBM", "SBUX", "RTX", "CVX", "GS", "CAT", "AMGN", "MS",
    "BLK", "T", "DE", "SPGI", "PLD", "INTU", "MDT", "GE", "AMAT", "ISRG",
    "BKNG", "ADI", "NOW", "MU", "TJX", "GILD", "MMC", "LRCX", "SYK",
    "VRTX", "SCHW", "CI", "ZTS", "MO", "ETN", "REGN", "CB", "BSX", "ADP",
    "EOG", "SLB", "FI", "SO", "KLAC", "PGR", "DUK", "PANW", "CME", "CSX",
    "EQIX", "ITW", "APD", "SNPS")
}
