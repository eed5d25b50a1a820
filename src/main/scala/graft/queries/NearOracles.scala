package graft.queries

/** DuckDB twins of the `near_*` queries (SURVEY §2 gate): each SQL
  * statement independently recomputes one of the reference's output
  * tables (`database/src/schema.rs:16-326`) from the materialized
  * normalized chain — explode/UNNEST for the per-block tables,
  * `WITH RECURSIVE` for receipt→tx lineage (§2.4, receipts.rs:159-482),
  * window `row_number()` twins for ordinals, fork dedup, and the
  * issue84 hash-collision suffix (transactions.rs:43-89).
  *
  * The input is what [[NearQueries]] writes to [[fixtureDir]]: the
  * post-parse `NormBlock` rows (scalar quirks — canonical JSON,
  * escape_default, hex-of-base64 — already applied by BlockParser and
  * spec-checked in NearSpec) plus the S4 lockup states. Everything
  * RELATIONAL downstream of the parser is recomputed here in SQL,
  * including the escape_default applied to event fields (a chr()-built
  * character-class fold, so the SQL carries no backslash literals) and
  * the U256 lockup math via the HUGEINT-safe decomposition
  * `floor(a*t/d) = (a/d)*t + ((a%d)*t)/d` (lockup.rs:104-159 needs up
  * to 192-bit intermediates; both factors here stay under 2^127).
  */
object NearOracles {

  /** Deterministic absolute path for the oracle's parquet input —
    * DuckDB runs with an unknown cwd, so the SQL bakes this in.
    */
  val fixtureDir: String =
    sys.env.getOrElse("GRAFT_FIXTURE_DIR", "/root/repo/.fixture/near")

  private def withR(ctes: String*): String =
    "WITH RECURSIVE " + ctes.mkString(",\n") + "\n"

  // The same SQL is instantiated twice — over the 4-block hand fixture
  // (`norm`) and the 256-block ScaleChain volume fixture (`scale_norm`)
  // — so these spots are tokens substituted at the bottom (the account
  // filters differ between the fixtures' account populations).
  private val NormTok = "@@NORM_DIR@@"
  private val TreeTok = "@@TREE_TX@@"
  private val FtTok = "@@FT_CONTRACT@@"
  private val BalTok = "@@BAL_ACCT@@"
  private val SignerTok = "@@SIGNER_ACCT@@"
  private val RecvTok = "@@RECV_ACCT@@"

  private val NORM = s"""norm AS (
  SELECT * FROM read_parquet('$NormTok/*.parquet')
)"""

  private val CHX = """chx AS (
  SELECT blockHash, blockHeight, blockTimestamp,
         unnest(chunks) AS c,
         unnest(generate_series(1, len(chunks))) - 1 AS chunkPos
  FROM norm
)"""

  private val BLOCKS = """blocks AS (
  SELECT CAST(blockHeight AS DECIMAL(20,0)) AS block_height,
         blockHash AS block_hash,
         prevBlockHash AS prev_block_hash,
         CAST(blockTimestamp AS DECIMAL(20,0)) AS block_timestamp,
         CAST(totalSupply AS DECIMAL(38,0)) AS total_supply,
         CAST(gasPrice AS DECIMAL(38,0)) AS gas_price,
         author AS author_account_id
  FROM norm
)"""

  /** transactions incl. fork dedup + issue84 suffix (Transforms
    * .transactionsBase): the fork discriminator is
    * converted_into_receipt_id; a surviving same-hash row ranked >1 is
    * a genuine collision and gets the `_issue84_<height>` suffix.
    */
  private val TX = """txx AS (
  SELECT blockHash, blockHeight, blockTimestamp, chunkPos,
         c.chunkHash AS chunkHash, unnest(c.transactions) AS t
  FROM chx
),
tx_fork AS (
  SELECT * FROM (
    SELECT *, row_number() OVER (
        PARTITION BY t.transactionHash, t.convertedIntoReceiptId
        ORDER BY CAST(blockHeight AS BIGINT), chunkPos, t.indexInChunk, blockHash) AS fork_rn
    FROM txx) WHERE fork_rn = 1
),
tx_named AS (
  SELECT *, CASE WHEN dup_rank = 1 THEN t.transactionHash
                 ELSE t.transactionHash || '_issue84_' || blockHeight END AS transaction_hash
  FROM (
    SELECT *, row_number() OVER (
        PARTITION BY t.transactionHash
        ORDER BY CAST(blockHeight AS BIGINT), chunkPos, t.indexInChunk, blockHash) AS dup_rank
    FROM tx_fork)
),
transactions AS (
  SELECT transaction_hash,
         blockHash AS included_in_block_hash,
         chunkHash AS included_in_chunk_hash,
         t.indexInChunk AS index_in_chunk,
         CAST(blockTimestamp AS DECIMAL(20,0)) AS block_timestamp,
         t.signerAccountId AS signer_account_id,
         t.signerPublicKey AS signer_public_key,
         CAST(t.nonce AS DECIMAL(20,0)) AS nonce,
         t.receiverAccountId AS receiver_account_id,
         t.signature AS signature,
         t.status AS status,
         t.convertedIntoReceiptId AS converted_into_receipt_id,
         CAST(t.receiptConversionGasBurnt AS DECIMAL(20,0)) AS receipt_conversion_gas_burnt,
         CAST(t.receiptConversionTokensBurnt AS DECIMAL(38,0)) AS receipt_conversion_tokens_burnt
  FROM tx_named
)"""

  /** Delegate-aware action flattening (Transforms.flattenActions /
    * transactions.rs:196-264): parent row per action + one row per
    * inner action; running index = windowed prefix sum of
    * (1 + inner_count).
    */
  private def flatten(name: String, src: String, keys: Seq[String]): String = {
    val ks = keys.mkString(", ")
    s"""${name}_ex AS (
  SELECT $ks, unnest(actions) AS a,
         unnest(generate_series(1, len(actions))) - 1 AS p
  FROM $src
),
${name}_based AS (
  SELECT *, CAST(coalesce(sum(1 + coalesce(len(a['inner']), 0)) OVER (
      PARTITION BY $ks ORDER BY p
      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS INTEGER) AS base
  FROM ${name}_ex
),
$name AS (
  SELECT $ks, base AS idx, a.kind AS action_kind, a.args AS args,
         a.delegateParameters IS NOT NULL AS is_delegate_action,
         a.delegateParameters AS delegate_parameters,
         CAST(NULL AS INTEGER) AS parent_index
  FROM ${name}_based
  UNION ALL
  SELECT $ks, CAST(base + 1 + q AS INTEGER) AS idx, ia.kind, ia.args,
         TRUE, dp, base
  FROM (
    SELECT $ks, base, a.delegateParameters AS dp,
           unnest(a['inner']) AS ia,
           unnest(generate_series(1, len(a['inner']))) - 1 AS q
    FROM ${name}_based WHERE a['inner'] IS NOT NULL AND len(a['inner']) > 0)
)"""
  }

  private val TA = flatten("ta",
    "(SELECT transaction_hash, t.actions AS actions FROM tx_named)",
    Seq("transaction_hash"))

  /** Chunk receipts + same-height-fork dedup (Ingest pkGuard: PK
    * receipt_id, first row under (blockTimestamp, blockHash) — the
    * string order equals numeric order, fixed-width 19-digit nanos).
    */
  private val RCX = """rcx AS (
  SELECT * FROM (
    SELECT blockHash, blockTimestamp, chunkHash, r,
           row_number() OVER (PARTITION BY r.receiptId
                              ORDER BY blockTimestamp, blockHash) AS rn
    FROM (SELECT blockHash, blockTimestamp, c.chunkHash AS chunkHash,
                 unnest(c.receipts) AS r
          FROM chx)) WHERE rn = 1
)"""

  private val OCX = """ocx AS (
  SELECT * FROM (
    SELECT blockHash, blockTimestamp, blockHeight, o,
           row_number() OVER (PARTITION BY o.receiptId
                              ORDER BY blockTimestamp, blockHash) AS rn
    FROM (SELECT blockHash, blockTimestamp, blockHeight, unnest(outcomes) AS o
          FROM norm)) WHERE rn = 1
)"""

  private val EOR = """eor AS (
  SELECT o.receiptId AS executed_receipt_id,
         unnest(o.producedReceiptIds) AS produced_receipt_id,
         unnest(generate_series(1, len(o.producedReceiptIds))) - 1 AS index_in_execution_outcome
  FROM ocx
)"""

  /** Lineage fixpoint (§2.4 / Lineage.resolve): seeds = tx conversions;
    * edges = produced ← executed ∪ data_id ← declaring receipt ∪
    * data receipt ← its data_id. The recursive UNION is the SQL form of
    * the iterative propagation join.
    */
  private val LIN = """edges AS (
  SELECT produced_receipt_id AS child, executed_receipt_id AS parent FROM eor
  UNION ALL
  SELECT odr.dataId AS child, r.receiptId AS parent
  FROM (SELECT r, unnest(r.outputDataReceivers) AS odr FROM rcx
        WHERE r.receiptKind = 'ACTION')
  UNION ALL
  SELECT r.receiptId AS child, r.dataId AS parent FROM rcx
  WHERE r.receiptKind = 'DATA'
),
lin_raw(child, tx) AS (
  SELECT converted_into_receipt_id, transaction_hash FROM transactions
  UNION
  SELECT e.child, l.tx FROM edges e JOIN lin_raw l ON e.parent = l.child
),
lin AS (
  SELECT child AS lineage_receipt_id, min(tx) AS originated_from_transaction_hash
  FROM lin_raw GROUP BY child
)"""

  private val RECEIPTS = """receipts AS (
  SELECT r.receiptId AS receipt_id,
         blockHash AS included_in_block_hash,
         chunkHash AS included_in_chunk_hash,
         r.indexInChunk AS index_in_chunk,
         CAST(blockTimestamp AS DECIMAL(20,0)) AS included_in_block_timestamp,
         r.predecessorAccountId AS predecessor_account_id,
         r.receiverAccountId AS receiver_account_id,
         r.receiptKind AS receipt_kind,
         l.originated_from_transaction_hash
  FROM rcx JOIN lin l ON r.receiptId = l.lineage_receipt_id
)"""

  private val RESOLVED = """resolved AS (
  SELECT rcx.* FROM rcx JOIN lin l ON r.receiptId = l.lineage_receipt_id
)"""

  private val ARA = flatten("ara", """(SELECT r.receiptId AS receipt_id,
    r.predecessorAccountId AS receipt_predecessor_account_id,
    r.receiverAccountId AS receipt_receiver_account_id,
    CAST(blockTimestamp AS DECIMAL(20,0)) AS receipt_included_in_block_timestamp,
    r.actions AS actions
  FROM resolved WHERE r.receiptKind = 'ACTION')""",
    Seq("receipt_id", "receipt_predecessor_account_id",
      "receipt_receiver_account_id", "receipt_included_in_block_timestamp"))

  private val XO = """execution_outcomes AS (
  SELECT o.receiptId AS receipt_id,
         blockHash AS executed_in_block_hash,
         CAST(blockTimestamp AS DECIMAL(20,0)) AS executed_in_block_timestamp,
         o.indexInChunk AS index_in_chunk,
         CAST(o.gasBurnt AS DECIMAL(20,0)) AS gas_burnt,
         CAST(o.tokensBurnt AS DECIMAL(38,0)) AS tokens_burnt,
         o.executorAccountId AS executor_account_id,
         o.status AS status,
         CAST(o.shardId AS DECIMAL(20,0)) AS shard_id
  FROM ocx
)"""

  /** Partial-unique-index dedup twin (up.sql:7-43): DuckDB window
    * PARTITION BY groups NULLs together, matching the per-null-pattern
    * index keys; both-cause rows are index-exempt and kept whole.
    */
  private val AC = """ac_raw AS (
  SELECT sc.affectedAccountId AS affected_account_id,
         CAST(blockTimestamp AS DECIMAL(20,0)) AS changed_in_block_timestamp,
         blockHash AS changed_in_block_hash,
         CASE WHEN sc.causeType = 'TRANSACTION_PROCESSING' THEN sc.causeTxHash END
           AS caused_by_transaction_hash,
         sc.causeReceiptHash AS caused_by_receipt_id,
         sc.causeType AS update_reason,
         CAST(coalesce(sc.amount, '0') AS DECIMAL(38,0)) AS affected_account_nonstaked_balance,
         CAST(coalesce(sc.locked, '0') AS DECIMAL(38,0)) AS affected_account_staked_balance,
         CAST(coalesce(sc.storageUsage, '0') AS DECIMAL(20,0)) AS affected_account_storage_usage,
         sc.indexInBlock AS index_in_block
  FROM (SELECT blockHash, blockTimestamp, unnest(stateChanges) AS sc FROM norm)
  WHERE sc.valueType IN ('account_update', 'account_deletion')
),
account_changes AS (
  SELECT * EXCLUDE (uni_rn) FROM (
    SELECT *, row_number() OVER (
        PARTITION BY affected_account_id, changed_in_block_hash,
          caused_by_transaction_hash, caused_by_receipt_id, update_reason,
          affected_account_nonstaked_balance, affected_account_staked_balance,
          affected_account_storage_usage
        ORDER BY changed_in_block_timestamp, index_in_block) AS uni_rn
    FROM ac_raw)
  WHERE uni_rn = 1
     OR (caused_by_transaction_hash IS NOT NULL AND caused_by_receipt_id IS NOT NULL)
)"""

  /** accounts lifecycle fold (accounts.rs:22-83): ord = zero-padded
    * (height, shard, outcome idx, action pos) so string max == the
    * reference's insertion-order comparison.
    */
  private val ACCTS = """acc_ev AS (
  SELECT account_id, receipt_id, h,
         CASE WHEN a.kind = 'CREATE_ACCOUNT' THEN 'CREATE'
              WHEN a.kind = 'TRANSFER' AND length(account_id) = 64 THEN 'CREATE'
              WHEN a.kind = 'DELETE_ACCOUNT' THEN 'DELETE' END AS ev,
         lpad(CAST(h AS VARCHAR), 20, '0') || '|' || lpad(CAST(s AS VARCHAR), 10, '0')
           || '|' || lpad(CAST(oi AS VARCHAR), 10, '0') || '|' || lpad(CAST(p AS VARCHAR), 10, '0') AS ord
  FROM (
    SELECT h, o.shardId AS s, o.indexInChunk AS oi,
           o.receipt.receiverAccountId AS account_id,
           o.receipt.receiptId AS receipt_id,
           unnest(o.receipt.actions) AS a,
           unnest(generate_series(1, len(o.receipt.actions))) - 1 AS p
    FROM (SELECT CAST(blockHeight AS BIGINT) AS h, unnest(outcomes) AS o FROM norm)
    WHERE o.status IN ('SUCCESS_VALUE', 'SUCCESS_RECEIPT_ID')
      AND o.receipt IS NOT NULL AND o.receipt.receiptKind = 'ACTION')
  WHERE ev IS NOT NULL
),
accounts AS (
  SELECT account_id,
         c_receipt AS created_by_receipt_id,
         CASE WHEN d_ord IS NOT NULL AND (c_ord IS NULL OR d_ord > c_ord)
              THEN d_receipt END AS deleted_by_receipt_id,
         CAST(h AS DECIMAL(20,0)) AS last_update_block_height
  FROM (
    SELECT account_id,
           max(ord) FILTER (WHERE ev = 'CREATE') AS c_ord,
           max_by(receipt_id, ord) FILTER (WHERE ev = 'CREATE') AS c_receipt,
           max(ord) FILTER (WHERE ev = 'DELETE') AS d_ord,
           max_by(receipt_id, ord) FILTER (WHERE ev = 'DELETE') AS d_receipt,
           max(h) AS h
    FROM acc_ev GROUP BY account_id)
)"""

  private val AK = """ak_ev AS (
  SELECT sc.publicKey AS public_key,
         sc.affectedAccountId AS account_id,
         CASE WHEN sc.valueType = 'access_key_update' THEN 'UPDATE' ELSE 'DELETE' END AS ev,
         sc.causeReceiptHash AS receipt_id,
         sc.akPermissionKind AS permission_kind, h,
         lpad(CAST(h AS VARCHAR), 20, '0') || '|'
           || lpad(CAST(sc.indexInBlock AS VARCHAR), 10, '0') AS ord
  FROM (SELECT CAST(blockHeight AS BIGINT) AS h, unnest(stateChanges) AS sc FROM norm)
  WHERE sc.causeType = 'RECEIPT_PROCESSING'
    AND sc.valueType IN ('access_key_update', 'access_key_deletion')
),
access_keys AS (
  SELECT public_key, account_id,
         u_receipt AS created_by_receipt_id,
         CASE WHEN d_ord IS NOT NULL AND (u_ord IS NULL OR d_ord > u_ord)
              THEN d_receipt END AS deleted_by_receipt_id,
         coalesce(u_perm, 'FULL_ACCESS') AS permission_kind,
         CAST(h AS DECIMAL(20,0)) AS last_update_block_height
  FROM (
    SELECT public_key, account_id,
           max(ord) FILTER (WHERE ev = 'UPDATE') AS u_ord,
           max_by(receipt_id, ord) FILTER (WHERE ev = 'UPDATE') AS u_receipt,
           max_by(permission_kind, ord) FILTER (WHERE ev = 'UPDATE') AS u_perm,
           max(ord) FILTER (WHERE ev = 'DELETE') AS d_ord,
           max_by(receipt_id, ord) FILTER (WHERE ev = 'DELETE') AS d_receipt,
           max(h) AS h
    FROM ak_ev GROUP BY public_key, account_id)
)"""

  /** Rust `char::escape_default` parity (BlockParser.escapeDefault),
    * built entirely from chr() so the SQL carries no backslash/quote
    * literals; coalesce because array_to_string([]) is NULL in DuckDB.
    */
  private def esc(col: String): String =
    "coalesce(array_to_string(list_transform(regexp_extract_all(coalesce(" + col +
      ", ''), chr(91) || chr(92) || 's' || chr(92) || 'S' || chr(93)), ch -> " +
      "CASE WHEN ch = chr(9) THEN chr(92) || 't' " +
      "WHEN ch = chr(13) THEN chr(92) || 'r' " +
      "WHEN ch = chr(10) THEN chr(92) || 'n' " +
      "WHEN ch = chr(92) THEN chr(92) || chr(92) " +
      "WHEN ch = chr(39) THEN chr(92) || chr(39) " +
      "WHEN ch = chr(34) THEN chr(92) || chr(34) " +
      "WHEN unicode(ch) >= 32 AND unicode(ch) <= 126 THEN ch " +
      "ELSE chr(92) || 'u{' || format('{:x}', unicode(ch)) || '}' END), ''), '')"

  /** NearEvent envelope structure for json_transform — the DuckDB twin
    * of Events.eventSchema (NULL-on-mismatch like Spark from_json).
    */
  private val EvStruct =
    """{"standard":"VARCHAR","version":"VARCHAR","event":"VARCHAR",""" +
      """"data":[{"owner_id":"VARCHAR","old_owner_id":"VARCHAR",""" +
      """"new_owner_id":"VARCHAR","amount":"VARCHAR","memo":"VARCHAR",""" +
      """"authorized_id":"VARCHAR","token_ids":["VARCHAR"]}]}"""

  private val PEV = s"""pev AS (
  SELECT blockHash, emitted_at_block_timestamp, shard_id, outcome_index,
         emitted_for_receipt_id, contract_id, log_pos,
         json_transform(TRY_CAST(trim(substr(log, 12)) AS JSON), '$EvStruct') AS ev
  FROM (
    SELECT * REPLACE (trim(log) AS log) FROM (
      SELECT blockHash,
             CAST(blockTimestamp AS DECIMAL(20,0)) AS emitted_at_block_timestamp,
             o.shardId AS shard_id, o.indexInChunk AS outcome_index,
             o.receipt.receiptId AS emitted_for_receipt_id,
             o.receipt.receiverAccountId AS contract_id,
             unnest(o.logs) AS log,
             unnest(generate_series(1, len(o.logs))) - 1 AS log_pos
      FROM (SELECT blockHash, blockTimestamp, unnest(outcomes) AS o FROM norm)
      WHERE o.receipt IS NOT NULL))
  WHERE log LIKE 'EVENT_JSON:%'
)"""

  private def evFilter(standard: String, checks: String): String =
    s"""ev IS NOT NULL AND ev.standard IS NOT NULL AND ev.event IS NOT NULL
    AND ev.data IS NOT NULL AND ev.standard = '$standard' AND ($checks)"""

  /** FT events (fungible_token_events.rs:48-138): per-kind
    * required-field rejection (serde whole-event semantics), per-shard
    * ordinal in (outcome, log, entry) order, PK dedup for forks.
    */
  private val FT = s"""ft_base AS (
  SELECT *, unnest(ev.data) AS d,
         unnest(generate_series(1, len(ev.data))) - 1 AS entry_pos
  FROM pev
  WHERE ${evFilter("nep141", """
    (ev.event = 'ft_mint' AND len(list_filter(ev.data, d -> d.owner_id IS NULL OR d.amount IS NULL)) = 0)
    OR (ev.event = 'ft_transfer' AND len(list_filter(ev.data, d -> d.old_owner_id IS NULL OR d.new_owner_id IS NULL OR d.amount IS NULL)) = 0)
    OR (ev.event = 'ft_burn' AND len(list_filter(ev.data, d -> d.owner_id IS NULL OR d.amount IS NULL)) = 0)""")}
),
ft_events AS (
  SELECT * FROM (
    SELECT *, row_number() OVER (
        PARTITION BY emitted_for_receipt_id, emitted_index_of_event_entry_in_shard
        ORDER BY emitted_at_block_timestamp) AS pk_rn
    FROM (
      SELECT emitted_for_receipt_id,
             emitted_at_block_timestamp,
             CAST(shard_id AS DECIMAL(20,0)) AS emitted_in_shard_id,
             CAST(row_number() OVER (PARTITION BY blockHash, shard_id
                 ORDER BY outcome_index, log_pos, entry_pos) - 1 AS BIGINT)
               AS emitted_index_of_event_entry_in_shard,
             contract_id AS emitted_by_contract_account_id,
             d.amount AS amount,
             CASE ev.event WHEN 'ft_mint' THEN 'MINT'
                           WHEN 'ft_transfer' THEN 'TRANSFER'
                           ELSE 'BURN' END AS event_kind,
             CASE ev.event WHEN 'ft_mint' THEN ''
                           WHEN 'ft_transfer' THEN ${esc("d.old_owner_id")}
                           ELSE ${esc("d.owner_id")} END AS token_old_owner_account_id,
             CASE ev.event WHEN 'ft_mint' THEN ${esc("d.owner_id")}
                           WHEN 'ft_transfer' THEN ${esc("d.new_owner_id")}
                           ELSE '' END AS token_new_owner_account_id,
             ${esc("d.memo")} AS event_memo
      FROM ft_base)) WHERE pk_rn = 1
)"""

  private val NFT = s"""nft_base AS (
  SELECT *, unnest(d.token_ids) AS token_id,
         unnest(generate_series(1, len(d.token_ids))) - 1 AS token_pos
  FROM (
    SELECT *, unnest(ev.data) AS d,
           unnest(generate_series(1, len(ev.data))) - 1 AS entry_pos
    FROM pev
    WHERE ${evFilter("nep171", """
      (ev.event = 'nft_mint' AND len(list_filter(ev.data, d -> d.owner_id IS NULL OR d.token_ids IS NULL)) = 0)
      OR (ev.event = 'nft_transfer' AND len(list_filter(ev.data, d -> d.old_owner_id IS NULL OR d.new_owner_id IS NULL OR d.token_ids IS NULL)) = 0)
      OR (ev.event = 'nft_burn' AND len(list_filter(ev.data, d -> d.owner_id IS NULL OR d.token_ids IS NULL)) = 0)""")})
),
nft_events AS (
  SELECT * FROM (
    SELECT *, row_number() OVER (
        PARTITION BY emitted_for_receipt_id, emitted_index_of_event_entry_in_shard
        ORDER BY emitted_at_block_timestamp) AS pk_rn
    FROM (
      SELECT emitted_for_receipt_id,
             emitted_at_block_timestamp,
             CAST(shard_id AS DECIMAL(20,0)) AS emitted_in_shard_id,
             CAST(row_number() OVER (PARTITION BY blockHash, shard_id
                 ORDER BY outcome_index, log_pos, entry_pos, token_pos) - 1 AS BIGINT)
               AS emitted_index_of_event_entry_in_shard,
             contract_id AS emitted_by_contract_account_id,
             ${esc("token_id")} AS token_id,
             CASE ev.event WHEN 'nft_mint' THEN 'MINT'
                           WHEN 'nft_transfer' THEN 'TRANSFER'
                           ELSE 'BURN' END AS event_kind,
             CASE ev.event WHEN 'nft_mint' THEN ''
                           WHEN 'nft_transfer' THEN ${esc("d.old_owner_id")}
                           ELSE ${esc("d.owner_id")} END AS token_old_owner_account_id,
             CASE ev.event WHEN 'nft_mint' THEN ${esc("d.owner_id")}
                           WHEN 'nft_transfer' THEN ${esc("d.new_owner_id")}
                           ELSE '' END AS token_new_owner_account_id,
             CASE ev.event WHEN 'nft_mint' THEN ''
                           ELSE ${esc("d.authorized_id")} END AS token_authorized_account_id,
             ${esc("d.memo")} AS event_memo
      FROM nft_base)) WHERE pk_rn = 1
)"""

  private val LOCKV = """lockups_view AS (
  SELECT l.account_id,
         bs.block_height AS creation_block_height,
         be.block_height AS deletion_block_height
  FROM (SELECT * FROM accounts WHERE account_id LIKE '%.lockup.near') l
  LEFT JOIN receipts rs ON l.created_by_receipt_id = rs.receipt_id
  LEFT JOIN blocks bs ON rs.included_in_block_hash = bs.block_hash
  LEFT JOIN receipts re ON l.deleted_by_receipt_id = re.receipt_id
  LEFT JOIN blocks be ON re.included_in_block_hash = be.block_hash
)"""

  private val TX_TREE = """tx_tree AS (
  SELECT r.receipt_id, r.included_in_block_hash, r.included_in_chunk_hash,
         r.index_in_chunk, r.included_in_block_timestamp,
         r.predecessor_account_id, r.receiver_account_id, r.receipt_kind,
         r.originated_from_transaction_hash,
         eo.status, eo.gas_burnt, eo.tokens_burnt
  FROM receipts r
  LEFT JOIN execution_outcomes eo ON r.receipt_id = eo.receipt_id
)"""

  private val U64Max = "CAST('18446744073709551615' AS HUGEINT)"

  /** Buggy code-hash whitelist (lockup.rs:78-100, the `true` rows). */
  private val Buggy =
    "('3kVY9qcVRoW3B5498SMX6R3rtSLiCdmBzKs7zcnzDJ7Q', 'DiC9bKCqUHqoYqUXovAnqugiuntHWnM3cAc7KrgaHTu')"

  private val Foundation =
    "CAST('300000000000000000000000000000000' AS HUGEINT)"

  /** get_locked_amount (lockup.rs:104-159) in HUGEINT-safe SQL: the
    * u128×u64 products are decomposed as (a/d)*t + ((a%d)*t)/d which
    * is exact for floor division and keeps every factor < 2^127.
    */
  private val SUPPLY = s"""blk AS (
  SELECT * FROM blocks
  WHERE block_timestamp <= CAST('1700000002000000000' AS DECIMAL(20,0))
  ORDER BY block_timestamp DESC, block_height DESC, block_hash ASC LIMIT 1
),
live AS (
  SELECT v.account_id FROM lockups_view v, blk b
  WHERE (v.creation_block_height IS NULL OR v.creation_block_height <= b.block_height)
    AND (v.deletion_block_height IS NULL OR v.deletion_block_height >= b.block_height)
),
states AS (
  SELECT * FROM read_parquet('$fixtureDir/lockup_states/*.parquet')
),
lock1 AS (
  SELECT CAST(s.lockupAmount AS HUGEINT) AS amount,
         CAST(s.terminationWithdrawnTokens AS HUGEINT) AS withdrawn,
         CAST(b.block_timestamp AS HUGEINT) AS bts,
         greatest(least(CAST(s.transfersTimestamp AS HUGEINT) + s.lockupDuration, $U64Max),
                  coalesce(s.lockupTimestamp, 0)) AS lockup_ts,
         s.codeHash IN $Buggy AS has_bug,
         CAST(s.releaseDuration AS HUGEINT) AS rd,
         s.transfersTimestamp, s.vestingType,
         CAST(s.vestingStart AS HUGEINT) AS vstart,
         CAST(s.vestingCliff AS HUGEINT) AS vcliff,
         CAST(s.vestingEnd AS HUGEINT) AS vend,
         s.terminatingUnvestedAmount
  FROM states s JOIN live ON s.accountId = live.account_id, blk b
),
lock2 AS (
  SELECT *, least(CASE WHEN has_bug THEN CAST(transfersTimestamp AS HUGEINT)
                       ELSE lockup_ts END + rd, $U64Max) AS end_ts
  FROM lock1
),
lock3 AS (
  SELECT *,
    CASE WHEN rd IS NULL THEN CAST(0 AS HUGEINT)
         WHEN bts >= end_ts THEN CAST(0 AS HUGEINT)
         ELSE (amount // rd) * (end_ts - bts) + ((amount % rd) * (end_ts - bts)) // rd
    END AS unreleased,
    CASE WHEN vestingType = 'SCHEDULE' THEN
           CASE WHEN bts < vcliff THEN amount
                WHEN bts >= vend THEN CAST(0 AS HUGEINT)
                ELSE (amount // (vend - vstart)) * (vend - bts)
                     + ((amount % (vend - vstart)) * (vend - bts)) // (vend - vstart) END
         WHEN vestingType = 'TERMINATING' THEN CAST(coalesce(terminatingUnvestedAmount, '0') AS HUGEINT)
         ELSE CAST(0 AS HUGEINT) END AS unvested
  FROM lock2
),
locked AS (
  SELECT CASE WHEN lockup_ts <= bts THEN
           greatest(greatest(unreleased - withdrawn, CAST(0 AS HUGEINT)), unvested)
         ELSE amount - withdrawn END AS locked
  FROM lock3
),
supply_agg AS (
  SELECT coalesce(sum(locked), CAST(0 AS HUGEINT)) AS lockups_locked,
         CAST(count(*) AS INTEGER) AS total_lockups,
         CAST(count(*) FILTER (WHERE locked > 0) AS INTEGER) AS unfinished_lockups
  FROM locked
)"""

  private val SupplySelect = s"""
SELECT b.block_timestamp AS computed_at_block_timestamp,
       b.block_hash AS computed_at_block_hash,
       CAST(CAST(b.total_supply AS HUGEINT) - $Foundation - a.lockups_locked AS DECIMAL(38,0))
         AS circulating_tokens_supply,
       b.total_supply AS total_tokens_supply,
       a.total_lockups AS total_lockup_contracts_count,
       a.unfinished_lockups AS unfinished_lockup_contracts_count,
       CAST($Foundation AS DECIMAL(38,0)) AS foundation_locked_tokens,
       CAST(a.lockups_locked AS DECIMAL(38,0)) AS lockups_locked_tokens
FROM blk b, supply_agg a"""

  private val preTx = withR(NORM, CHX, TX)
  private val preFull = withR(NORM, CHX, TX, RCX, OCX, EOR, LIN, RECEIPTS)

  private val araSelect = """
SELECT receipt_id, idx AS index_in_action_receipt, action_kind, args,
       receipt_predecessor_account_id, receipt_receiver_account_id,
       receipt_included_in_block_timestamp, is_delegate_action,
       delegate_parameters,
       parent_index AS delegate_parent_index_in_action_receipt
FROM ara"""

  private val eventOrder =
    "ORDER BY emitted_at_block_timestamp, emitted_in_shard_id, emitted_index_of_event_entry_in_shard"

  private val rawSql: Map[String, String] = Map(
    "near_blocks" -> (withR(NORM, BLOCKS) +
      "SELECT * FROM blocks ORDER BY block_height, block_hash"),

    "near_chunks" -> (withR(NORM, CHX) + """
SELECT included_in_block_hash, chunk_hash, shard_id, signature, gas_limit, gas_used, author_account_id FROM (
  SELECT blockHash AS included_in_block_hash,
         c.chunkHash AS chunk_hash,
         CAST(c.shardId AS DECIMAL(20,0)) AS shard_id,
         c.signature AS signature,
         CAST(c.gasLimit AS DECIMAL(20,0)) AS gas_limit,
         CAST(c.gasUsed AS DECIMAL(20,0)) AS gas_used,
         c.author AS author_account_id,
         row_number() OVER (PARTITION BY c.chunkHash ORDER BY blockHash) AS rn
  FROM chx) WHERE rn = 1
ORDER BY chunk_hash"""),

    "near_transactions" ->
      (preTx + "SELECT * FROM transactions ORDER BY transaction_hash"),

    "near_transaction_actions" -> (withR(NORM, CHX, TX, TA) + """
SELECT transaction_hash, idx AS index_in_transaction, action_kind, args,
       is_delegate_action, delegate_parameters,
       parent_index AS delegate_parent_index_in_transaction
FROM ta ORDER BY transaction_hash, index_in_transaction"""),

    "near_receipts" -> (preFull + "SELECT * FROM receipts ORDER BY receipt_id"),

    "near_action_receipts" ->
      (withR(NORM, CHX, TX, RCX, OCX, EOR, LIN, RESOLVED) + """
SELECT r.receiptId AS receipt_id,
       r.signerAccountId AS signer_account_id,
       r.signerPublicKey AS signer_public_key,
       CAST(r.gasPrice AS DECIMAL(38,0)) AS gas_price
FROM resolved WHERE r.receiptKind = 'ACTION' ORDER BY receipt_id"""),

    "near_action_receipt_actions" ->
      (withR(NORM, CHX, TX, RCX, OCX, EOR, LIN, RESOLVED, ARA) + araSelect +
        " ORDER BY receipt_id, index_in_action_receipt"),

    "near_action_receipt_input_data" ->
      (withR(NORM, CHX, TX, RCX, OCX, EOR, LIN, RESOLVED) + """
SELECT input_data_id, input_to_receipt_id FROM (
  SELECT unnest(r.inputDataIds) AS input_data_id,
         r.receiptId AS input_to_receipt_id
  FROM resolved WHERE r.receiptKind = 'ACTION')
ORDER BY input_data_id, input_to_receipt_id"""),

    "near_action_receipt_output_data" ->
      (withR(NORM, CHX, TX, RCX, OCX, EOR, LIN, RESOLVED) + """
SELECT odr.dataId AS output_data_id, output_from_receipt_id,
       odr.receiverAccountId AS receiver_account_id FROM (
  SELECT unnest(r.outputDataReceivers) AS odr,
         r.receiptId AS output_from_receipt_id
  FROM resolved WHERE r.receiptKind = 'ACTION')
ORDER BY output_data_id"""),

    "near_data_receipts" -> (withR(NORM, CHX, TX, RCX, OCX, EOR, LIN, RESOLVED) + """
SELECT r.dataId AS data_id, r.receiptId AS receipt_id, r.data AS data
FROM resolved WHERE r.receiptKind = 'DATA' ORDER BY data_id"""),

    "near_execution_outcomes" -> (withR(NORM, OCX, XO) +
      "SELECT * FROM execution_outcomes ORDER BY receipt_id"),

    "near_execution_outcome_receipts" -> (withR(NORM, OCX, EOR) + """
SELECT executed_receipt_id, index_in_execution_outcome, produced_receipt_id
FROM eor ORDER BY executed_receipt_id, index_in_execution_outcome"""),

    "near_account_changes" -> (withR(NORM, AC) + """
SELECT * FROM account_changes ORDER BY changed_in_block_timestamp, index_in_block"""),

    "near_accounts" ->
      (withR(NORM, ACCTS) + "SELECT * FROM accounts ORDER BY account_id"),

    "near_access_keys" -> (withR(NORM, AK) +
      "SELECT * FROM access_keys ORDER BY account_id, public_key"),

    "near_ft_events" -> (withR(NORM, PEV, FT) +
      s"SELECT * EXCLUDE (pk_rn) FROM ft_events $eventOrder"),

    "near_nft_events" -> (withR(NORM, PEV, NFT) +
      s"SELECT * EXCLUDE (pk_rn) FROM nft_events $eventOrder"),

    "near_lockups" ->
      (withR(NORM, BLOCKS, CHX, TX, RCX, OCX, EOR, LIN, RECEIPTS, ACCTS, LOCKV) +
        "SELECT * FROM lockups_view ORDER BY account_id"),

    "near_q_tx_by_signer" -> (preTx + """
SELECT * FROM transactions WHERE signer_account_id = '@@SIGNER_ACCT@@'
ORDER BY block_timestamp, index_in_chunk, transaction_hash LIMIT 100"""),

    "near_q_receipts_by_receiver" -> (preFull + """
SELECT * FROM receipts WHERE receiver_account_id = '@@RECV_ACCT@@'
ORDER BY included_in_block_timestamp, index_in_chunk, receipt_id LIMIT 100"""),

    "near_q_method_calls" ->
      (withR(NORM, CHX, TX, RCX, OCX, EOR, LIN, RESOLVED, ARA) + araSelect + s"""
WHERE action_kind = 'FUNCTION_CALL'
  AND json_extract_string(args, '$$.method_name') = 'do_it'
ORDER BY receipt_included_in_block_timestamp, receipt_id, index_in_action_receipt"""),

    "near_q_ft_history" -> (withR(NORM, PEV, FT) + s"""
SELECT * EXCLUDE (pk_rn) FROM ft_events
WHERE emitted_by_contract_account_id = '$FtTok'
  AND (token_old_owner_account_id = 'bob.near' OR token_new_owner_account_id = 'bob.near')
$eventOrder"""),

    "near_q_nft_history" -> (withR(NORM, PEV, NFT) + s"""
SELECT * EXCLUDE (pk_rn) FROM nft_events
WHERE emitted_by_contract_account_id = '$FtTok' AND token_id = 'tk1'
$eventOrder"""),

    "near_q_tx_receipt_tree" ->
      (withR(NORM, CHX, TX, RCX, OCX, EOR, LIN, RECEIPTS, XO, TX_TREE) + s"""
SELECT * FROM tx_tree WHERE originated_from_transaction_hash = '$TreeTok'
ORDER BY included_in_block_timestamp, index_in_chunk"""),

    "near_q_daily_gas" -> (withR(NORM, OCX, XO) + """
SELECT day_ns, CAST(count(*) AS BIGINT) AS n_outcomes,
       sum(gas_burnt) AS gas_burnt_total,
       sum(tokens_burnt) AS tokens_burnt_total
FROM (SELECT *,
        executed_in_block_timestamp - (executed_in_block_timestamp % 86400000000000) AS day_ns
      FROM execution_outcomes) t
GROUP BY day_ns ORDER BY day_ns"""),

    "near_q_active_accounts" -> (preTx + """
SELECT day_ns, CAST(count(DISTINCT signer_account_id) AS BIGINT) AS n_signers,
       CAST(count(*) AS BIGINT) AS n_txs
FROM (SELECT *,
        block_timestamp - (block_timestamp % 86400000000000) AS day_ns
      FROM transactions) t
GROUP BY day_ns ORDER BY day_ns"""),

    "near_q_balance_history" -> (withR(NORM, AC) + """
SELECT changed_in_block_timestamp, index_in_block,
       affected_account_nonstaked_balance, affected_account_staked_balance,
       update_reason, caused_by_transaction_hash, caused_by_receipt_id
FROM account_changes WHERE affected_account_id = '@@BAL_ACCT@@'
ORDER BY changed_in_block_timestamp, index_in_block"""),

    "near_circulating_supply" ->
      (withR(NORM, BLOCKS, CHX, TX, RCX, OCX, EOR, LIN, RECEIPTS, ACCTS, LOCKV,
        SUPPLY) + SupplySelect),
  )

  /** Hash-stable outer projection, the DuckDB twin of
    * NearQueries.hashStable: the driver canonicalizes via pandas
    * `astype(str)` and DuckDB's `.df()` floats DECIMAL columns
    * ('1.7e+18' vs Spark's exact '1700000000000000000') and yields
    * unhashable bytearrays for BLOB. Emit DECIMAL as VARCHAR and BLOB
    * as lowercase hex so both sides hash identical strings.
    */
  private def stable(inner: String, dec: Seq[String], bin: Seq[String]): String =
    if (dec.isEmpty && bin.isEmpty) inner
    else {
      val reps = dec.map(c => s"CAST($c AS VARCHAR) AS $c") ++
        bin.map(c => s"lower(hex($c)) AS $c")
      s"SELECT * REPLACE (${reps.mkString(", ")}) FROM (\n$inner\n) stable_q"
    }

  private val txDec =
    Seq("block_timestamp", "nonce", "receipt_conversion_gas_burnt",
      "receipt_conversion_tokens_burnt")
  private val eventDec = Seq("emitted_at_block_timestamp", "emitted_in_shard_id")

  /** DECIMAL (and BLOB) output columns per query — everything else is
    * already hash-stable (VARCHAR/BIGINT/BOOLEAN).
    */
  private val decCols: Map[String, (Seq[String], Seq[String])] = Map(
    "near_blocks" ->
      (Seq("block_height", "block_timestamp", "total_supply", "gas_price"), Nil),
    "near_chunks" -> (Seq("shard_id", "gas_limit", "gas_used"), Nil),
    "near_transactions" -> (txDec, Nil),
    "near_transaction_actions" -> (Nil, Nil),
    "near_receipts" -> (Seq("included_in_block_timestamp"), Nil),
    "near_action_receipts" -> (Seq("gas_price"), Nil),
    "near_action_receipt_actions" ->
      (Seq("receipt_included_in_block_timestamp"), Nil),
    "near_action_receipt_input_data" -> (Nil, Nil),
    "near_action_receipt_output_data" -> (Nil, Nil),
    "near_data_receipts" -> (Nil, Seq("data")),
    "near_execution_outcomes" ->
      (Seq("executed_in_block_timestamp", "gas_burnt", "tokens_burnt", "shard_id"), Nil),
    "near_execution_outcome_receipts" -> (Nil, Nil),
    "near_account_changes" ->
      (Seq("changed_in_block_timestamp", "affected_account_nonstaked_balance",
        "affected_account_staked_balance", "affected_account_storage_usage"), Nil),
    "near_accounts" -> (Seq("last_update_block_height"), Nil),
    "near_access_keys" -> (Seq("last_update_block_height"), Nil),
    "near_ft_events" -> (eventDec, Nil),
    "near_nft_events" -> (eventDec, Nil),
    "near_lockups" ->
      (Seq("creation_block_height", "deletion_block_height"), Nil),
    "near_q_tx_by_signer" -> (txDec, Nil),
    "near_q_receipts_by_receiver" -> (Seq("included_in_block_timestamp"), Nil),
    "near_q_method_calls" -> (Seq("receipt_included_in_block_timestamp"), Nil),
    "near_q_ft_history" -> (eventDec, Nil),
    "near_q_nft_history" -> (eventDec, Nil),
    "near_q_tx_receipt_tree" ->
      (Seq("included_in_block_timestamp", "gas_burnt", "tokens_burnt"), Nil),
    "near_q_balance_history" ->
      (Seq("changed_in_block_timestamp", "affected_account_nonstaked_balance",
        "affected_account_staked_balance"), Nil),
    "near_q_daily_gas" ->
      (Seq("day_ns", "gas_burnt_total", "tokens_burnt_total"), Nil),
    "near_q_active_accounts" -> (Seq("day_ns"), Nil),
    "near_circulating_supply" ->
      (Seq("computed_at_block_timestamp", "circulating_tokens_supply",
        "total_tokens_supply", "foundation_locked_tokens",
        "lockups_locked_tokens"), Nil),
  )

  /** The daily circulating-supply series twin (Views
    * .dailyCirculatingSupply / main.rs:60-158 over history): one row
    * per UTC day, computed at the day's last block; per-day live
    * lockups via the liveness theta-join; the same HUGEINT-safe
    * locked-amount decomposition as SUPPLY, carried per (day, lockup).
    * Scale-fixture-only (the hand fixture spans a single day).
    */
  private val DAILY = s"""day_blk AS (
  SELECT * FROM (
    SELECT *, row_number() OVER (PARTITION BY day_ns
        ORDER BY block_timestamp DESC, block_height DESC, block_hash ASC) AS rn
    FROM (SELECT *, CAST(block_timestamp AS HUGEINT)
            - (CAST(block_timestamp AS HUGEINT) % 86400000000000) AS day_ns
          FROM blocks)) WHERE rn = 1
),
states AS (
  SELECT * FROM read_parquet('$fixtureDir/scale_lockup_states/*.parquet')
),
lock1 AS (
  SELECT b.day_ns,
         CAST(s.lockupAmount AS HUGEINT) AS amount,
         CAST(s.terminationWithdrawnTokens AS HUGEINT) AS withdrawn,
         CAST(b.block_timestamp AS HUGEINT) AS bts,
         greatest(least(CAST(s.transfersTimestamp AS HUGEINT) + s.lockupDuration, $U64Max),
                  coalesce(s.lockupTimestamp, 0)) AS lockup_ts,
         s.codeHash IN $Buggy AS has_bug,
         CAST(s.releaseDuration AS HUGEINT) AS rd,
         s.transfersTimestamp, s.vestingType,
         CAST(s.vestingStart AS HUGEINT) AS vstart,
         CAST(s.vestingCliff AS HUGEINT) AS vcliff,
         CAST(s.vestingEnd AS HUGEINT) AS vend,
         s.terminatingUnvestedAmount
  FROM day_blk b
  JOIN lockups_view v
    ON (v.creation_block_height IS NULL OR v.creation_block_height <= b.block_height)
   AND (v.deletion_block_height IS NULL OR v.deletion_block_height >= b.block_height)
  JOIN states s ON s.accountId = v.account_id
),
lock2 AS (
  SELECT *, least(CASE WHEN has_bug THEN CAST(transfersTimestamp AS HUGEINT)
                       ELSE lockup_ts END + rd, $U64Max) AS end_ts
  FROM lock1
),
lock3 AS (
  SELECT *,
    CASE WHEN rd IS NULL THEN CAST(0 AS HUGEINT)
         WHEN bts >= end_ts THEN CAST(0 AS HUGEINT)
         ELSE (amount // rd) * (end_ts - bts) + ((amount % rd) * (end_ts - bts)) // rd
    END AS unreleased,
    CASE WHEN vestingType = 'SCHEDULE' THEN
           CASE WHEN bts < vcliff THEN amount
                WHEN bts >= vend THEN CAST(0 AS HUGEINT)
                ELSE (amount // (vend - vstart)) * (vend - bts)
                     + ((amount % (vend - vstart)) * (vend - bts)) // (vend - vstart) END
         WHEN vestingType = 'TERMINATING' THEN CAST(coalesce(terminatingUnvestedAmount, '0') AS HUGEINT)
         ELSE CAST(0 AS HUGEINT) END AS unvested
  FROM lock2
),
locked AS (
  SELECT day_ns,
         CASE WHEN lockup_ts <= bts THEN
           greatest(greatest(unreleased - withdrawn, CAST(0 AS HUGEINT)), unvested)
         ELSE amount - withdrawn END AS locked
  FROM lock3
),
supply_agg AS (
  SELECT day_ns,
         sum(locked) AS lockups_locked,
         CAST(count(*) AS INTEGER) AS total_lockups,
         CAST(count(*) FILTER (WHERE locked > 0) AS INTEGER) AS unfinished_lockups
  FROM locked GROUP BY day_ns
)"""

  private val DailySelect = s"""
SELECT b.block_timestamp AS computed_at_block_timestamp,
       b.block_hash AS computed_at_block_hash,
       CAST(CAST(b.total_supply AS HUGEINT) - $Foundation - coalesce(a.lockups_locked, 0) AS DECIMAL(38,0))
         AS circulating_tokens_supply,
       b.total_supply AS total_tokens_supply,
       coalesce(a.total_lockups, 0) AS total_lockup_contracts_count,
       coalesce(a.unfinished_lockups, 0) AS unfinished_lockup_contracts_count,
       CAST($Foundation AS DECIMAL(38,0)) AS foundation_locked_tokens,
       CAST(coalesce(a.lockups_locked, 0) AS DECIMAL(38,0)) AS lockups_locked_tokens
FROM day_blk b LEFT JOIN supply_agg a ON b.day_ns = a.day_ns
ORDER BY computed_at_block_timestamp"""

  private val dailySupplySql =
    withR(NORM, BLOCKS, CHX, TX, RCX, OCX, EOR, LIN, RECEIPTS, ACCTS, LOCKV,
      DAILY) + DailySelect

  /** Queries re-instantiated over the ScaleChain volume fixture — the
    * full table surface plus the account-parameterized consumer
    * queries (hand-fixture supply stays fixture-only: its states come
    * from the hand Lockup fixture; the scale series is
    * near_scale_q_daily_supply below).
    */
  private val scaleKeys = Seq(
    "near_blocks", "near_chunks", "near_transactions",
    "near_transaction_actions", "near_receipts", "near_action_receipts",
    "near_action_receipt_actions", "near_action_receipt_input_data",
    "near_action_receipt_output_data", "near_data_receipts",
    "near_execution_outcomes", "near_execution_outcome_receipts",
    "near_account_changes", "near_accounts", "near_access_keys",
    "near_ft_events", "near_nft_events", "near_lockups",
    "near_q_tx_receipt_tree", "near_q_daily_gas", "near_q_active_accounts",
    "near_q_method_calls", "near_q_ft_history", "near_q_nft_history",
    "near_q_balance_history", "near_q_tx_by_signer",
    "near_q_receipts_by_receiver")

  private def finish(q: String, normDir: String, treeTx: String,
      ftContract: String, balAcct: String,
      signer: String = "user1.near", recv: String = "user1.near"): String =
    q.replace(NormTok, normDir).replace(TreeTok, treeTx)
      .replace(FtTok, ftContract).replace(BalTok, balAcct)
      .replace(SignerTok, signer).replace(RecvTok, recv)

  /** Genesis twins (S3): re-parse the ORIGINAL genesis document with
    * DuckDB's JSON reader — the engine's token-level split → JSONL →
    * distributed read must reconstruct the same seed rows.
    */
  private val genesisSrc =
    s"""(SELECT genesis_height, unnest(records) AS r
  FROM read_json('$fixtureDir/genesis.json',
    columns={'genesis_height':'BIGINT','records':'JSON[]'})) g"""

  private val genesisAccountsSql = s"""
SELECT json_extract_string(r, '$$.Account.account_id') AS account_id,
       CAST(NULL AS VARCHAR) AS created_by_receipt_id,
       CAST(NULL AS VARCHAR) AS deleted_by_receipt_id,
       CAST(genesis_height AS DECIMAL(20,0)) AS last_update_block_height
FROM $genesisSrc
WHERE json_extract(r, '$$.Account') IS NOT NULL
ORDER BY account_id"""

  private val genesisAccessKeysSql = s"""
SELECT json_extract_string(r, '$$.AccessKey.public_key') AS public_key,
       json_extract_string(r, '$$.AccessKey.account_id') AS account_id,
       CAST(NULL AS VARCHAR) AS created_by_receipt_id,
       CAST(NULL AS VARCHAR) AS deleted_by_receipt_id,
       CASE WHEN json_extract(r, '$$.AccessKey.access_key.permission.FunctionCall') IS NOT NULL
            THEN 'FUNCTION_CALL' ELSE 'FULL_ACCESS' END AS permission_kind,
       CAST(genesis_height AS DECIMAL(20,0)) AS last_update_block_height
FROM $genesisSrc
WHERE json_extract(r, '$$.AccessKey') IS NOT NULL
ORDER BY account_id, public_key"""

  val sql: Map[String, String] = {
    def wrap(name: String, q: String) = {
      val (dec, bin) = decCols.getOrElse(name, (Nil, Nil))
      stable(q, dec, bin)
    }
    rawSql.map { case (name, q) =>
      name -> wrap(name, finish(q, s"$fixtureDir/norm", "T1",
        "carol.near", "alice.near", signer = "alice.near",
        recv = "bob.near"))
    } ++ scaleKeys.map { k =>
      ("near_scale_" + k.stripPrefix("near_")) ->
        wrap(k, finish(rawSql(k), s"$fixtureDir/scale_norm",
          graft.near.ScaleChain.WhaleTx, "user1.near", "user1.near"))
    } + ("near_scale_q_daily_supply" ->
      wrap("near_circulating_supply",
        finish(dailySupplySql, s"$fixtureDir/scale_norm", "", "", ""))) +
      ("near_genesis_accounts" ->
        stable(genesisAccountsSql, Seq("last_update_block_height"), Nil)) +
      ("near_genesis_access_keys" ->
        stable(genesisAccessKeysSql, Seq("last_update_block_height"), Nil)) +
      // J7: the backfill join must reconstruct exactly what the live
      // transform emits — same twin as near_action_receipt_actions.
      ("near_backfill_ara_denorm" ->
        wrap("near_action_receipt_actions",
          finish(rawSql("near_action_receipt_actions"), s"$fixtureDir/norm",
            "T1", "carol.near", "alice.near"))) ++
      // Streamed-warehouse convergence: the STREAMING path (microbatch
      // commits, cross-batch lineage/pending, registry delta
      // compaction) must hash-equal the batch twins at volume.
      Seq("near_blocks" -> "blocks",
        "near_chunks" -> "chunks",
        "near_receipts" -> "receipts",
        "near_transactions" -> "transactions",
        "near_transaction_actions" -> "transaction_actions",
        "near_action_receipts" -> "action_receipts",
        "near_action_receipt_input_data" -> "action_receipt_input_data",
        "near_action_receipt_output_data" -> "action_receipt_output_data",
        "near_execution_outcomes" -> "execution_outcomes",
        "near_ft_events" -> "ft_events",
        "near_accounts" -> "accounts",
        "near_access_keys" -> "access_keys",
        "near_action_receipt_actions" -> "action_receipt_actions",
        "near_execution_outcome_receipts" -> "execution_outcome_receipts",
        "near_account_changes" -> "account_changes",
        "near_nft_events" -> "nft_events",
        "near_data_receipts" -> "data_receipts",
        "near_lockups" -> "lockups").map { case (base, suffix) =>
        s"near_scale_streamed_$suffix" ->
          wrap(base, finish(rawSql(base), s"$fixtureDir/scale_norm",
            graft.near.ScaleChain.WhaleTx, "user1.near", "user1.near"))
      }.toMap ++
      // Second-seed volume gate: identical reconstruction SQL over the
      // seed-13 chain's norm fixture — independent collision patterns,
      // fork placements, and churn interleavings.
      Seq("near_transactions" -> "transactions",
        "near_receipts" -> "receipts",
        "near_action_receipt_actions" -> "action_receipt_actions",
        "near_nft_events" -> "nft_events",
        "near_accounts" -> "accounts",
        "near_access_keys" -> "access_keys").map { case (base, suffix) =>
        s"near_scale2_$suffix" ->
          wrap(base, finish(rawSql(base), s"$fixtureDir/scale2_norm",
            graft.near.ScaleChain.WhaleTx, "user1.near", "user1.near"))
      }.toMap ++
      // …and the seed-13 STREAMED registries (delta compaction under
      // second-seed cross-batch event placement).
      Seq("near_accounts" -> "accounts",
        "near_access_keys" -> "access_keys").map { case (base, suffix) =>
        s"near_scale2_streamed_$suffix" ->
          wrap(base, finish(rawSql(base), s"$fixtureDir/scale2_norm",
            graft.near.ScaleChain.WhaleTx, "user1.near", "user1.near"))
      }.toMap
  }
}
