package graft.near

import java.math.BigInteger
import java.nio.{ByteBuffer, ByteOrder}
import java.util.Base64

import com.fasterxml.jackson.databind.{JsonNode, ObjectMapper}
import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}

/** S4: the JSON-RPC point source (`circulating-supply/src/lockup.rs:
  * 19-73`, `account_details.rs:28-59`) — ViewState/ViewAccount/block
  * queries producing `Lockup.State` rows and account balances, so the
  * circulating-supply job runs WITHOUT pre-built state tables.
  *
  * The transport is pluggable ([[Rpc.Transport]]): production uses
  * [[Rpc.HttpTransport]] (JDK HttpClient, no extra deps); specs use a
  * recorded-fixture transport. State fetches fan out over executors via
  * `mapPartitions` — each partition holds a bounded slice of lockup
  * account ids and issues its own point lookups, so the walk
  * parallelizes with lockup count instead of the reference's
  * sequential driver loop (main.rs:185-205).
  */
object Rpc {

  /** Minimal POST transport: body in, body out. Serializable so
    * executors can carry it into mapPartitions closures.
    */
  trait Transport extends Serializable {
    def post(body: String): String
  }

  /** Exponential-backoff retry around one transport call — the RPC twin
    * of [[JdbcSink.retry]] (reference wraps every DB/RPC interaction in
    * the same schedule, `database/src/retryable.rs:1-43`): 100 ms,
    * doubling while below the cap. Retries transient transport faults
    * (I/O); RPC-level errors (the JSON `error` member) are NOT retried —
    * they are deterministic answers, not faults. `sleep` injectable for
    * tests.
    */
  def withRetry[T](policy: JdbcSink.RetryPolicy = JdbcSink.RetryPolicy(),
      sleep: Long => Unit = Thread.sleep)(body: () => T): T = {
    var interval = policy.initialBackoffMs
    var attempt = 0
    var last: Throwable = null
    while (attempt < policy.maxAttempts) {
      attempt += 1
      try return body()
      catch {
        case e: java.io.IOException =>
          last = e
          if (attempt < policy.maxAttempts) {
            sleep(interval)
            interval = math.min(interval * 2, policy.maxBackoffMs)
          }
      }
    }
    throw new java.io.IOException(
      s"RPC failed after ${policy.maxAttempts} attempts. Stop trying.", last)
  }

  /** Deterministic (non-retryable) HTTP failure: a 4xx other than 429
    * is the server's final answer for this request — retrying cannot
    * change it, and returning the error body as a payload would only
    * defer the failure to JSON parsing with a confusing message.
    * Deliberately NOT an IOException, so [[withRetry]] lets it through.
    */
  final class RpcClientError(val statusCode: Int, bodyPreview: String)
    extends RuntimeException(
      s"HTTP $statusCode from RPC endpoint (not retryable): $bodyPreview")

  /** JDK-only HTTP transport; the client is rebuilt per JVM (it is not
    * serializable and must not ride in the closure). Each POST is
    * retried with [[withRetry]]'s backoff — one flaky fetch inside a
    * 1000-lockup `mapPartitions` pass must not fail the whole stage.
    * Server-side transient failures (429 rate limit, 5xx) arrive as
    * normal responses, not I/O faults — they are converted to
    * IOException so the retry engages; other 4xx are deterministic
    * answers and fail fast with [[RpcClientError]].
    */
  final case class HttpTransport(url: String,
      policy: JdbcSink.RetryPolicy = JdbcSink.RetryPolicy()) extends Transport {
    @transient private lazy val client = java.net.http.HttpClient.newHttpClient()
    def post(body: String): String = withRetry(policy) { () =>
      val req = java.net.http.HttpRequest.newBuilder(java.net.URI.create(url))
        .header("Content-Type", "application/json")
        .POST(java.net.http.HttpRequest.BodyPublishers.ofString(body))
        .build()
      val resp = client.send(req,
        java.net.http.HttpResponse.BodyHandlers.ofString())
      val sc = resp.statusCode()
      if (sc == 429 || sc >= 500)
        throw new java.io.IOException(s"HTTP $sc from RPC endpoint")
      if (sc >= 400)
        throw new RpcClientError(sc, resp.body().take(200))
      resp.body()
    }
  }

  private def mapper = new ObjectMapper()

  private def queryBody(params: (String, Any)*): String = {
    val m = mapper
    val root = m.createObjectNode()
    root.put("jsonrpc", "2.0").put("id", "graft").put("method", "query")
    val p = root.putObject("params")
    params.foreach {
      case (k, v: String) => p.put(k, v)
      case (k, v: Long)   => p.put(k, v)
      case (k, v)         => p.put(k, v.toString)
    }
    m.writeValueAsString(root)
  }

  private def result(transport: Transport, body: String): JsonNode = {
    val node = mapper.readTree(transport.post(body))
    val err = node.get("error")
    if (err != null) throw new RuntimeException(s"RPC error: $err for $body")
    node.get("result")
  }

  /** ViewState at a height: raw borsh bytes of the first stored value
    * (the lockup contract keeps its whole state under one key,
    * lockup.rs:55-61).
    */
  def viewStateFirstValue(transport: Transport, accountId: String,
      blockHeight: Long): Array[Byte] = {
    val r = result(transport, queryBody(
      "request_type" -> "view_state", "block_id" -> blockHeight,
      "account_id" -> accountId, "prefix_base64" -> ""))
    val values = r.get("values")
    if (values == null || !values.elements().hasNext)
      throw new RuntimeException(s"no state values for $accountId@$blockHeight")
    Base64.getDecoder.decode(values.get(0).get("value").asText())
  }

  /** ViewAccount at a height → (amount yoctoNEAR, code hash). */
  def viewAccount(transport: Transport, accountId: String,
      blockHeight: Long): (BigInt, String) = {
    val r = result(transport, queryBody(
      "request_type" -> "view_account", "block_id" -> blockHeight,
      "account_id" -> accountId))
    (BigInt(r.get("amount").asText()), r.get("code_hash").asText())
  }

  /** Latest final block timestamp in nanos (main.rs:265-283) — the
    * wait-for-blocks probe of the daily loop.
    */
  def finalBlockTimestamp(transport: Transport): BigInt = {
    val body = """{"jsonrpc":"2.0","id":"graft","method":"block","params":{"finality":"final"}}"""
    val header = result(transport, body).get("header")
    val ns = header.get("timestamp_nanosec")
    if (ns != null) BigInt(ns.asText()) else BigInt(header.get("timestamp").asLong())
  }

  /** Borsh (little-endian, public spec) reader covering the
    * LockupContract layout (`lockup_types.rs:32-84`).
    */
  final class BorshReader(bytes: Array[Byte]) {
    private val buf = ByteBuffer.wrap(bytes).order(ByteOrder.LITTLE_ENDIAN)
    def u8(): Int = buf.get() & 0xff
    def u32(): Long = buf.getInt() & 0xffffffffL
    def u64(): Long = buf.getLong() // u64 as signed bits; compare unsigned upstream
    def u128(): BigInteger = {
      val b = new Array[Byte](16)
      buf.get(b)
      // LE → BE for BigInteger
      new BigInteger(1, b.reverse)
    }
    def bytesVec(): Array[Byte] = {
      val n = u32().toInt
      val b = new Array[Byte](n)
      buf.get(b)
      b
    }
    def string(): String = new String(bytesVec(), "UTF-8")
    def option[T](read: () => T): Option[T] =
      if (u8() == 0) None else Some(read())
  }

  /** Borsh writer (the spec's fixture encoder; same layout). */
  final class BorshWriter {
    private val out = new java.io.ByteArrayOutputStream()
    def u8(v: Int): this.type = { out.write(v & 0xff); this }
    def u32(v: Long): this.type = {
      val b = ByteBuffer.allocate(4).order(ByteOrder.LITTLE_ENDIAN)
      b.putInt(v.toInt); out.write(b.array()); this
    }
    def u64(v: Long): this.type = {
      val b = ByteBuffer.allocate(8).order(ByteOrder.LITTLE_ENDIAN)
      b.putLong(v); out.write(b.array()); this
    }
    def u128(v: BigInteger): this.type = {
      val raw = v.toByteArray.reverse.padTo(16, 0.toByte) // LE, zero-extended
      out.write(raw.take(16).toArray, 0, 16); this
    }
    def bytesVec(b: Array[Byte]): this.type = { u32(b.length); out.write(b); this }
    def string(s: String): this.type = bytesVec(s.getBytes("UTF-8"))
    def option[T](v: Option[T])(write: T => Unit): this.type = {
      v match { case None => u8(0); case Some(x) => u8(1); write(x) }; this
    }
    def toBytes: Array[Byte] = out.toByteArray
  }

  /** Decoded-but-unprojected lockup contract fields (the part of the
    * borsh layout `Lockup.State` needs; trailing fields are consumed
    * for offset correctness and dropped).
    */
  final case class RawLockupState(
      ownerAccountId: String,
      lockupAmount: BigInteger,
      terminationWithdrawnTokens: BigInteger,
      lockupDuration: Long,
      releaseDuration: Option[Long],
      lockupTimestamp: Option[Long],
      vestingType: String,
      vestingStart: Option[Long],
      vestingCliff: Option[Long],
      vestingEnd: Option[Long],
      terminatingUnvestedAmount: Option[BigInteger])

  /** Decode the ViewState borsh blob (lockup_types.rs:32-84). The
    * transfers_information variant is consumed but ignored — the
    * caller injects the mainnet phase-2 timestamp exactly like
    * lockup.rs:66-73 does.
    */
  def decodeLockupContract(bytes: Array[Byte]): RawLockupState = {
    val r = new BorshReader(bytes)
    val owner = r.string()
    val lockupAmount = r.u128()
    val withdrawn = r.u128()
    val lockupDuration = r.u64()
    val releaseDuration = r.option(() => r.u64())
    val lockupTimestamp = r.option(() => r.u64())
    r.u8() match {
      case 0 => r.u64() // TransfersEnabled { transfers_timestamp }
      case 1 => r.string() // TransfersDisabled { transfer_poll_account_id }
      case v => throw new RuntimeException(s"bad TransfersInformation tag $v")
    }
    val (vt, vs, vc, ve, tua) = r.u8() match {
      case 0 => (Lockup.VestingNone, None, None, None, None)
      case 1 => r.bytesVec(); (Lockup.VestingHash, None, None, None, None)
      case 2 =>
        val s = r.u64(); val c = r.u64(); val e = r.u64()
        (Lockup.VestingSchedule, Some(s), Some(c), Some(e), None)
      case 3 =>
        val unvested = r.u128(); r.u8() // TerminationStatus discarded
        (Lockup.VestingTerminating, None, None, None, Some(unvested))
      case v => throw new RuntimeException(s"bad VestingInformation tag $v")
    }
    RawLockupState(owner, lockupAmount, withdrawn, lockupDuration,
      releaseDuration, lockupTimestamp, vt, vs, vc, ve, tua)
  }

  /** One point lookup: ViewState (borsh state) + ViewAccount (code
    * hash), assembled into the relational `Lockup.State` with the
    * phase-2 transfers timestamp injected (lockup.rs:66-73).
    */
  def fetchLockupState(transport: Transport, accountId: String,
      blockHeight: Long): Lockup.State = {
    val raw = decodeLockupContract(
      viewStateFirstValue(transport, accountId, blockHeight))
    val (_, codeHash) = viewAccount(transport, accountId, blockHeight)
    Lockup.State(
      accountId = accountId,
      codeHash = codeHash,
      lockupAmount = raw.lockupAmount.toString,
      terminationWithdrawnTokens = raw.terminationWithdrawnTokens.toString,
      lockupDuration = raw.lockupDuration,
      releaseDuration = raw.releaseDuration,
      lockupTimestamp = raw.lockupTimestamp,
      transfersTimestamp = Lockup.TransfersEnabledNs,
      vestingType = raw.vestingType,
      vestingStart = raw.vestingStart,
      vestingCliff = raw.vestingCliff,
      vestingEnd = raw.vestingEnd,
      terminatingUnvestedAmount = raw.terminatingUnvestedAmount.map(_.toString))
  }

  /** Distributed state fetch: one `Lockup.State` per live lockup
    * account id (`account_id` column). Each partition issues its own
    * point lookups — throughput scales with executors while each call
    * stays a bounded O(1) RPC, unlike any warehouse scan.
    */
  def lockupStates(spark: SparkSession, liveAccountIds: DataFrame,
      transport: Transport, blockHeight: Long): Dataset[Lockup.State] = {
    import spark.implicits._
    liveAccountIds.select("account_id").as[String]
      .mapPartitions(_.map(fetchLockupState(transport, _, blockHeight)))
  }

  /** Foundation accounts whose balances count as locked
    * (main.rs:208-218).
    */
  val FoundationAccounts: Seq[String] = Seq("lockup.near", "contributors.near")

  /** Σ foundation balances at the block height — two point reads. */
  def foundationLockedTokens(transport: Transport,
      blockHeight: Long): BigInt =
    FoundationAccounts.map(viewAccount(transport, _, blockHeight)._1).sum
}
