package graft.near

import com.fasterxml.jackson.databind.{JsonNode, ObjectMapper}
import com.fasterxml.jackson.databind.node.{ArrayNode, JsonNodeFactory, ObjectNode, TextNode}
import scala.jdk.CollectionConverters._

/** One-pass parser: raw StreamerMessage JSON (one block) → NormBlock.
  *
  * This is the single variant-normalization boundary: NEAR JSON encodes
  * enums heterogeneously ("CreateAccount" vs {"Transfer": {...}};
  * "Unknown" vs {"SuccessValue": "..."}), which no static Spark schema
  * can type. Everything downstream of this parser is pure DataFrame
  * code. Serialization semantics mirror
  * `database/src/models/serializers.rs:64-152` exactly, including:
  * - canonical sorted-key JSON (serde_json's BTreeMap ordering),
  * - Rust `escape_default` string escaping (nulls/controls/unicode),
  * - the DeployContract `code_sha256 = hex(bytes of the base64 STRING)`
  *   quirk (serializers.rs:70-73),
  * - FunctionCall best-effort `args_json` embedding (decode-or-skip).
  */
object BlockParser {

  private val mapper = new ObjectMapper()
  private val nf = JsonNodeFactory.instance

  /** Rust `char::escape_default` parity (serializers.rs:137-152 applies
    * it to every JSON string value; models apply it to event fields).
    */
  def escapeDefault(s: String): String = {
    val sb = new java.lang.StringBuilder(s.length + 8)
    var i = 0
    while (i < s.length) {
      val cp = s.codePointAt(i)
      cp match {
        case '\t' => sb.append("\\t")
        case '\r' => sb.append("\\r")
        case '\n' => sb.append("\\n")
        case '\\' => sb.append("\\\\")
        case '\'' => sb.append("\\'")
        case '"'  => sb.append("\\\"")
        case c if c >= 0x20 && c <= 0x7e => sb.append(c.toChar)
        case c => sb.append("\\u{").append(Integer.toHexString(c)).append("}")
      }
      i += Character.charCount(cp)
    }
    sb.toString
  }

  /** Canonical JSON: keys sorted recursively (serde_json BTreeMap
    * ordering), no extra whitespace.
    */
  def canonicalize(node: JsonNode): JsonNode = node match {
    case o: ObjectNode =>
      val out = nf.objectNode()
      o.properties().asScala.map(e => e.getKey -> e.getValue).toSeq
        .sortBy(_._1).foreach { case (k, v) => out.set[JsonNode](k, canonicalize(v)) }
      out
    case a: ArrayNode =>
      val out = nf.arrayNode()
      a.elements().asScala.foreach(e => out.add(canonicalize(e)))
      out
    case other => other
  }

  /** escape_json (serializers.rs:137-152): escape every STRING VALUE
    * recursively (keys untouched, like the reference).
    */
  private def escapeJsonValues(node: JsonNode): JsonNode = node match {
    case o: ObjectNode =>
      val out = nf.objectNode()
      o.properties().asScala.foreach { e =>
        out.set[JsonNode](e.getKey, escapeJsonValues(e.getValue))
      }
      out
    case a: ArrayNode =>
      val out = nf.arrayNode()
      a.elements().asScala.foreach(e => out.add(escapeJsonValues(e)))
      out
    case t: TextNode => nf.textNode(escapeDefault(t.textValue()))
    case other => other
  }

  private def canonicalString(node: JsonNode): String =
    mapper.writeValueAsString(canonicalize(node))

  /** Migration parity for `2021-05-07-115559_convert_args_base64_to_
    * args_json/up.sql`: embed `args_json` into a stored canonical args
    * string — decode args_base64, parse, and on ANY failure set `{}`
    * (the migration's decode_or_null), unlike the live parser's
    * decode-or-SKIP. jsonb's key sorting = our canonical form. Args
    * without args_base64 (non-FunctionCall) pass through untouched.
    */
  def embedArgsJson(args: String): String = {
    val node = mapper.readTree(args)
    node match {
      case o: ObjectNode if o.has("args_base64") =>
        val parsed =
          try {
            val p = mapper.readTree(
              java.util.Base64.getDecoder.decode(o.get("args_base64").asText()))
            // ::jsonb accepts scalars too — only unparseable payloads
            // fall back to {} (the migration's decode_or_null)
            if (p == null || p.isMissingNode) nf.objectNode() else p
          } catch { case _: Exception => nf.objectNode() }
        o.set[JsonNode]("args_json", parsed)
        canonicalString(o)
      case _ => args
    }
  }

  private def optText(n: JsonNode, field: String): Option[String] =
    Option(n.get(field)).filterNot(_.isNull).map(_.asText)

  private def text(n: JsonNode, field: String): String = {
    val v = n.get(field)
    require(v != null && !v.isNull, s"missing field $field in ${n.toString.take(200)}")
    v.asText
  }

  // ---- Action serialization (serializers.rs:64-131) -------------------

  private val KindNames = Map(
    "CreateAccount" -> "CREATE_ACCOUNT",
    "DeployContract" -> "DEPLOY_CONTRACT",
    "FunctionCall" -> "FUNCTION_CALL",
    "Transfer" -> "TRANSFER",
    "Stake" -> "STAKE",
    "AddKey" -> "ADD_KEY",
    "DeleteKey" -> "DELETE_KEY",
    "DeleteAccount" -> "DELETE_ACCOUNT",
    "Delegate" -> "DELEGATE_ACTION")

  private def hexLower(bytes: Array[Byte]): String =
    bytes.map("%02x".format(_)).mkString

  /** AccessKeyView serialization copy (serializers.rs:12-62): explicit
    * permission_kind/permission_details tagging, escaped receiver/
    * method names, dec_format allowance (string or null).
    */
  private def accessKeyJson(ak: JsonNode): ObjectNode = {
    val out = nf.objectNode()
    out.set[JsonNode]("nonce", ak.get("nonce"))
    val perm = ak.get("permission")
    val permOut = nf.objectNode()
    if (perm.isTextual && perm.asText == "FullAccess") {
      permOut.put("permission_kind", "FULL_ACCESS")
    } else if (perm.has("FunctionCall")) {
      val fc = perm.get("FunctionCall")
      permOut.put("permission_kind", "FUNCTION_CALL")
      val details = nf.objectNode()
      val allowance = fc.get("allowance")
      if (allowance == null || allowance.isNull) details.putNull("allowance")
      else details.put("allowance", allowance.asText)
      details.put("receiver_id", escapeDefault(text(fc, "receiver_id")))
      val mn = nf.arrayNode()
      Option(fc.get("method_names")).foreach(_.elements().asScala
        .foreach(m => mn.add(escapeDefault(m.asText))))
      details.set[JsonNode]("method_names", mn)
      permOut.set[JsonNode]("permission_details", details)
    } else {
      permOut.put("permission_kind", "FULL_ACCESS")
    }
    out.set[JsonNode]("permission", permOut)
    out
  }

  /** (kind, args-json) for one action node; delegate yields args={}. */
  private def serializeAction(action: JsonNode): (String, String) = {
    if (action.isTextual) {
      // unit variant: "CreateAccount"
      return (KindNames(action.asText), "{}")
    }
    val variant = action.properties().asScala.head.getKey
    val body = action.get(variant)
    val kind = KindNames(variant)
    val args: JsonNode = variant match {
      case "CreateAccount" => nf.objectNode()
      case "DeployContract" =>
        val o = nf.objectNode()
        // quirk parity (serializers.rs:70-73): hex of the BASE64 STRING's
        // bytes, not of the decoded code
        o.put("code_sha256", hexLower(text(body, "code").getBytes("UTF-8")))
        o
      case "FunctionCall" =>
        val o = nf.objectNode()
        o.put("method_name", escapeDefault(text(body, "method_name")))
        o.put("args_base64", text(body, "args"))
        o.set[JsonNode]("gas", body.get("gas"))
        o.put("deposit", text(body, "deposit"))
        // best-effort args_json (issue #87): decode base64 → parse JSON →
        // escape string values; skip silently on any failure
        try {
          val decoded = java.util.Base64.getDecoder.decode(text(body, "args"))
          val parsed = mapper.readTree(decoded)
          if (parsed != null && !parsed.isMissingNode)
            o.set[JsonNode]("args_json", escapeJsonValues(parsed))
        } catch { case _: Exception => () }
        o
      case "Transfer" =>
        val o = nf.objectNode(); o.put("deposit", text(body, "deposit")); o
      case "Stake" =>
        val o = nf.objectNode()
        o.put("stake", text(body, "stake"))
        o.put("public_key", text(body, "public_key"))
        o
      case "AddKey" =>
        val o = nf.objectNode()
        o.put("public_key", text(body, "public_key"))
        o.set[JsonNode]("access_key", accessKeyJson(body.get("access_key")))
        o
      case "DeleteKey" =>
        val o = nf.objectNode(); o.put("public_key", text(body, "public_key")); o
      case "DeleteAccount" =>
        val o = nf.objectNode()
        o.put("beneficiary_id", text(body, "beneficiary_id"))
        o
      case "Delegate" => nf.objectNode() // args = {} (serializers.rs:130)
      case other => throw new IllegalArgumentException(s"unknown action variant $other")
    }
    (kind, canonicalString(args))
  }

  /** Full NormAction incl. delegate parameters + inner actions
    * (transactions.rs:209-249).
    */
  private def parseAction(action: JsonNode): NormAction = {
    val (kind, args) = serializeAction(action)
    if (kind == "DELEGATE_ACTION") {
      val d = action.get("Delegate")
      val da = d.get("delegate_action")
      val params = nf.objectNode()
      params.put("signature", text(d, "signature"))
      params.put("sender_id", text(da, "sender_id"))
      params.put("receiver_id", text(da, "receiver_id"))
      params.set[JsonNode]("nonce", da.get("nonce"))
      params.set[JsonNode]("max_block_height", da.get("max_block_height"))
      params.put("public_key", text(da, "public_key"))
      val inner = da.get("actions").elements().asScala.map { na =>
        val (k, a) = serializeAction(na)
        NormInnerAction(k, a)
      }.toSeq
      NormAction(kind, args, Some(canonicalString(params)), Some(inner))
    } else NormAction(kind, args, None, None)
  }

  // ---- Status / receipts / outcomes -----------------------------------

  /** ExecutionStatusView → enum (enums.rs:48-61). */
  private def parseStatus(status: JsonNode): String =
    if (status == null || status.isNull) "UNKNOWN"
    else if (status.isTextual) "UNKNOWN" // only the "Unknown" unit variant is textual
    else if (status.has("SuccessValue")) "SUCCESS_VALUE"
    else if (status.has("SuccessReceiptId")) "SUCCESS_RECEIPT_ID"
    else if (status.has("Failure")) "FAILURE"
    else "UNKNOWN"

  private def parseReceipt(r: JsonNode, indexInChunk: Int): NormReceipt = {
    val enumView = r.get("receipt")
    if (enumView.has("Action")) {
      val a = enumView.get("Action")
      NormReceipt(
        receiptId = text(r, "receipt_id"),
        indexInChunk = indexInChunk,
        predecessorAccountId = text(r, "predecessor_id"),
        receiverAccountId = text(r, "receiver_id"),
        receiptKind = "ACTION",
        signerAccountId = Some(text(a, "signer_id")),
        signerPublicKey = Some(text(a, "signer_public_key")),
        gasPrice = Some(text(a, "gas_price")),
        actions = Some(a.get("actions").elements().asScala.map(parseAction).toSeq),
        inputDataIds = Some(Option(a.get("input_data_ids")).map(
          _.elements().asScala.map(_.asText).toSeq).getOrElse(Seq.empty)),
        outputDataReceivers = Some(Option(a.get("output_data_receivers")).map(
          _.elements().asScala.map(d =>
            NormDataReceiver(text(d, "data_id"), text(d, "receiver_id"))).toSeq)
          .getOrElse(Seq.empty)),
        dataId = None, data = None)
    } else {
      val d = enumView.get("Data")
      NormReceipt(
        receiptId = text(r, "receipt_id"),
        indexInChunk = indexInChunk,
        predecessorAccountId = text(r, "predecessor_id"),
        receiverAccountId = text(r, "receiver_id"),
        receiptKind = "DATA",
        signerAccountId = None, signerPublicKey = None, gasPrice = None,
        actions = None, inputDataIds = None, outputDataReceivers = None,
        dataId = Some(text(d, "data_id")),
        data = optText(d, "data").map(java.util.Base64.getDecoder.decode))
    }
  }

  private val CauseNames = Map(
    "transaction_processing" -> "TRANSACTION_PROCESSING",
    "action_receipt_processing_started" -> "ACTION_RECEIPT_PROCESSING_STARTED",
    "action_receipt_gas_reward" -> "ACTION_RECEIPT_GAS_REWARD",
    "receipt_processing" -> "RECEIPT_PROCESSING",
    "postponed_receipt" -> "POSTPONED_RECEIPT",
    "updated_delayed_receipts" -> "UPDATED_DELAYED_RECEIPTS",
    "validator_accounts_update" -> "VALIDATOR_ACCOUNTS_UPDATE",
    "migration" -> "MIGRATION",
    "resharding" -> "RESHARDING")

  private def parseStateChange(sc: JsonNode, idx: Int): NormStateChange = {
    val cause = sc.get("cause")
    val causeType = text(cause, "type")
    val change = sc.get("change")
    val valueType = text(sc, "type")
    // AccountUpdate flattens the AccountView fields into `change`
    // (serde(flatten) on StateChangeValueView)
    val (amount, locked, storageUsage) =
      if (valueType == "account_update")
        (optText(change, "amount"), optText(change, "locked"),
          optText(change, "storage_usage"))
      else (None, None, None)
    val (akNonce, akPermKind, akPerm) =
      if (valueType == "access_key_update") {
        val ak = change.get("access_key")
        val perm = ak.get("permission")
        val kind = if (perm.isTextual && perm.asText == "FullAccess") "FULL_ACCESS"
          else if (perm.has("FunctionCall")) "FUNCTION_CALL"
          else "FULL_ACCESS"
        (Some(ak.get("nonce").asText), Some(kind),
          Some(canonicalString(accessKeyJson(ak))))
      } else (None, None, None)
    NormStateChange(
      indexInBlock = idx,
      causeType = CauseNames.getOrElse(causeType, causeType.toUpperCase),
      causeTxHash = if (causeType == "transaction_processing") optText(cause, "tx_hash") else None,
      causeReceiptHash = if (Set("action_receipt_processing_started",
          "action_receipt_gas_reward", "receipt_processing",
          "postponed_receipt").contains(causeType))
        optText(cause, "receipt_hash") else None,
      valueType = valueType,
      affectedAccountId = text(change, "account_id"),
      publicKey = optText(change, "public_key"),
      amount = amount, locked = locked, storageUsage = storageUsage,
      akNonce = akNonce, akPermissionKind = akPermKind, akPermission = akPerm)
  }

  /** Parse one StreamerMessage JSON document. */
  def parse(json: String): NormBlock = {
    val root = mapper.readTree(json)
    val block = root.get("block")
    val header = block.get("header")
    val shards = Option(root.get("shards")).map(_.elements().asScala.toSeq)
      .getOrElse(Seq.empty)

    val chunks = shards.flatMap { shard =>
      Option(shard.get("chunk")).filterNot(_.isNull).map { chunk =>
        val ch = chunk.get("header")
        NormChunk(
          chunkHash = text(ch, "chunk_hash"),
          shardId = ch.get("shard_id").asLong,
          signature = text(ch, "signature"),
          gasLimit = text(ch, "gas_limit"),
          gasUsed = text(ch, "gas_used"),
          author = text(chunk, "author"),
          transactions = Option(chunk.get("transactions")).map(
            _.elements().asScala.zipWithIndex.map { case (t, i) =>
              val tx = t.get("transaction")
              val eo = t.get("outcome").get("execution_outcome")
              val outcome = eo.get("outcome")
              val receiptIds = outcome.get("receipt_ids").elements().asScala.map(_.asText).toSeq
              require(receiptIds.nonEmpty, "`receipt_ids` must contain one Receipt Id")
              NormTx(
                transactionHash = text(tx, "hash"),
                indexInChunk = i,
                signerAccountId = text(tx, "signer_id"),
                signerPublicKey = text(tx, "public_key"),
                nonce = tx.get("nonce").asText,
                receiverAccountId = text(tx, "receiver_id"),
                signature = text(tx, "signature"),
                status = parseStatus(outcome.get("status")),
                convertedIntoReceiptId = receiptIds.head,
                receiptConversionGasBurnt = outcome.get("gas_burnt").asText,
                receiptConversionTokensBurnt = text(outcome, "tokens_burnt"),
                actions = tx.get("actions").elements().asScala.map(parseAction).toSeq)
            }.toSeq).getOrElse(Seq.empty),
          receipts = Option(chunk.get("receipts")).map(
            _.elements().asScala.zipWithIndex.map { case (r, i) =>
              parseReceipt(r, i)
            }.toSeq).getOrElse(Seq.empty))
      }
    }

    val outcomes = shards.flatMap { shard =>
      val shardId = shard.get("shard_id").asLong
      Option(shard.get("receipt_execution_outcomes")).map(
        _.elements().asScala.zipWithIndex.map { case (o, i) =>
          val eo = o.get("execution_outcome")
          val outcome = eo.get("outcome")
          NormOutcome(
            receiptId = text(eo, "id"),
            indexInChunk = i,
            shardId = shardId,
            gasBurnt = outcome.get("gas_burnt").asText,
            tokensBurnt = text(outcome, "tokens_burnt"),
            executorAccountId = text(outcome, "executor_id"),
            status = parseStatus(outcome.get("status")),
            logs = Option(outcome.get("logs")).map(
              _.elements().asScala.map(_.asText).toSeq).getOrElse(Seq.empty),
            producedReceiptIds = Option(outcome.get("receipt_ids")).map(
              _.elements().asScala.map(_.asText).toSeq).getOrElse(Seq.empty),
            receipt = Option(o.get("receipt")).filterNot(_.isNull)
              .map(parseReceipt(_, -1)))
        }.toSeq).getOrElse(Seq.empty)
    }

    // index_in_block enumerates state changes across ALL shards in shard
    // order (account_changes.rs:22-55 processes the block's flattened list)
    val stateChanges = shards.flatMap { shard =>
      Option(shard.get("state_changes")).map(
        _.elements().asScala.toSeq).getOrElse(Seq.empty)
    }.zipWithIndex.map { case (sc, i) => parseStateChange(sc, i) }

    NormBlock(
      blockHash = text(header, "hash"),
      prevBlockHash = text(header, "prev_hash"),
      blockHeight = header.get("height").asText,
      blockTimestamp = header.get("timestamp").asText,
      totalSupply = text(header, "total_supply"),
      gasPrice = text(header, "gas_price"),
      author = text(block, "author"),
      chunks = chunks,
      outcomes = outcomes,
      stateChanges = stateChanges)
  }
}
