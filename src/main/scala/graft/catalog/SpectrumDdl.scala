package graft.catalog

import org.apache.spark.sql.types._

/** Pure generation of Redshift-Spectrum / Glue-catalog DDL for published
  * graft datasets — the Spark-native re-expression of the reference's
  * `publish_redshift.py`. The reference executes these statements against a
  * live cluster (publish_redshift.py:181,202,300); graft generates the exact
  * SQL strings (unit-testable, executable by any client), since DDL
  * execution is an I/O concern, not an engine one.
  */
object SpectrumDdl {

  /** Redshift reserved words (publish_redshift.py:14). */
  private val ReservedWords: Set[String] =
    ("AES128 AES256 ALL ALLOWOVERWRITE ANALYSE ANALYZE AND ANY ARRAY AS ASC AUTHORIZATION BACKUP BETWEEN " +
      "BINARY BLANKSASNULL BOTH BYTEDICT BZIP2 CASE CAST CHECK COLLATE COLUMN CONSTRAINT CREATE CREDENTIALS " +
      "CROSS CURRENT_DATE CURRENT_TIME CURRENT_TIMESTAMP CURRENT_USER CURRENT_USER_ID DEFAULT DEFERRABLE " +
      "DEFLATE DEFRAG DELTA DELTA32K DESC DISABLE DISTINCT DO ELSE EMPTYASNULL ENABLE ENCODE ENCRYPT " +
      "ENCRYPTION END EXCEPT EXPLICIT FALSE FOR FOREIGN FREEZE FROM FULL GLOBALDICT256 GLOBALDICT64K GRANT " +
      "GROUP GZIP HAVING IDENTITY IGNORE ILIKE IN INITIALLY INNER INTERSECT INTO IS ISNULL JOIN LANGUAGE " +
      "LEADING LEFT LIKE LIMIT LOCALTIME LOCALTIMESTAMP LUN LUNS LZO LZOP MINUS MOSTLY13 MOSTLY32 MOSTLY8 " +
      "NATURAL NEW NOT NOTNULL NULL NULLS OFF OFFLINE OFFSET OID OLD ON ONLY OPEN OR ORDER OUTER OVERLAPS " +
      "PARALLEL PARTITION PERCENT PERMISSIONS PLACING PRIMARY RAW READRATIO RECOVER REFERENCES RESPECT " +
      "REJECTLOG RESORT RESTORE RIGHT SELECT SESSION_USER SIMILAR SNAPSHOT SOME SYSDATE SYSTEM TABLE TAG " +
      "TDES TEXT255 TEXT32K THEN TIMESTAMP TO TOP TRAILING TRUE TRUNCATECOLUMNS UNION UNIQUE USER USING " +
      "VERBOSE WALLET WHEN WHERE WITH WITHOUT").split(' ').toSet

  /** Name validity per the reference (publish_redshift.py:18): not reserved,
    * starts alphanumeric/underscore, no spaces/quotes, 1..127 chars.
    * Returns None when valid, or the failure reason.
    */
  def validateName(name: String): Option[String] =
    if (ReservedWords.contains(name.toUpperCase))
      Some(s"name: $name cannot be a reserved SQL keyword")
    else if (name.isEmpty || !(name.head.isLetterOrDigit || name.head == '_'))
      Some(s"name: $name can only start with an alphanumeric or an underscore")
    else if (name.exists(c => c == ' ' || c == '\'' || c == '"'))
      Some(s"name: $name cannot contain spaces or quotations")
    else if (name.length < 1 || name.length > 127)
      Some(s"name: $name must be between 1 and 127 characters")
    else None

  def requireValidNames(names: String*): Unit =
    names.foreach(n => validateName(n).foreach(m => throw new IllegalArgumentException(m)))

  /** Spark type → Redshift/Spectrum type (the Spark-native analogue of the
    * reference's pandas-dtype mapper, publish_redshift.py:148).
    */
  def redshiftType(dt: DataType): String = dt match {
    case StringType => "VARCHAR"
    case ByteType | ShortType | IntegerType => "INTEGER"
    case LongType => "BIGINT"
    case FloatType => "REAL"
    case DoubleType => "FLOAT"
    case DateType | TimestampType | TimestampNTZType => "TIMESTAMP"
    case BooleanType => "BOOLEAN"
    case d: DecimalType => s"DECIMAL(${d.precision},${d.scale})"
    case other =>
      throw new IllegalArgumentException(
        s"Error: $other is not a datatype which can be mapped to Redshift.")
  }

  private def columnList(fields: Seq[StructField]): String =
    fields.map(f => s"${f.name} ${redshiftType(f.dataType)}").mkString("(", ", ", ")")

  /** CREATE EXTERNAL SCHEMA (publish_redshift.py:181). */
  def createSchemaDdl(schemaName: String, dbName: String, iamRole: String): String = {
    requireValidNames(schemaName, dbName)
    s"CREATE EXTERNAL SCHEMA IF NOT EXISTS $schemaName FROM DATA CATALOG " +
      s"database '$dbName' iam_role '$iamRole';"
  }

  /** CREATE EXTERNAL TABLE over a published dataset (publish_redshift.py:202).
    * `schema` is the full logical schema; partition columns are split out
    * into the PARTITIONED BY clause exactly as the reference does.
    */
  def createTableDdl(tableName: String, schemaName: String, schema: StructType,
                     partitions: Seq[String], location: String): String = {
    requireValidNames(tableName)
    val (partFields, dataFields) = schema.fields.toIndexedSeq.partition(f => partitions.contains(f.name))
    val cols = columnList(dataFields)
    if (partitions.isEmpty)
      s"CREATE EXTERNAL TABLE $schemaName.$tableName $cols STORED AS PARQUET LOCATION '$location';"
    else {
      // Preserve caller-declared partition order, not schema order.
      val ordered = partitions.map(p => partFields.find(_.name == p).get)
      s"CREATE EXTERNAL TABLE $schemaName.$tableName $cols PARTITIONED BY ${columnList(ordered)} " +
        s"STORED AS PARQUET LOCATION '$location';"
    }
  }

  /** CREATE EXTERNAL TABLE with fully custom column types
    * (publish_redshift.py:241 `create_custom_table`): `customColumns` maps
    * every column (in order) to its Redshift type string.
    */
  def createCustomTableDdl(tableName: String, schemaName: String,
                           customColumns: Seq[(String, String)],
                           partitions: Seq[String], location: String): String = {
    requireValidNames(tableName)
    val (partCols, dataCols) = customColumns.partition { case (n, _) => partitions.contains(n) }
    val cols = dataCols.map { case (n, t) => s"$n $t" }.mkString("(", ", ", ")")
    if (partitions.isEmpty)
      s"CREATE EXTERNAL TABLE $schemaName.$tableName $cols STORED AS PARQUET LOCATION '$location';"
    else {
      val parts = partCols.map { case (n, t) => s"$n $t" }.mkString("(", ", ", ")")
      s"CREATE EXTERNAL TABLE $schemaName.$tableName $cols PARTITIONED BY $parts " +
        s"STORED AS PARQUET LOCATION '$location';"
    }
  }

  /** The `k=v` path segments of one data file (publish_redshift.py:50). */
  private[catalog] def partitionsOf(filepath: String): Seq[String] =
    filepath.split('/').toIndexedSeq.filter(_.contains('='))

  /** Directory of the file's last partition level (publish_redshift.py:124). */
  private[catalog] def partitionLocation(filepath: String): String = {
    val segs = filepath.split('/').toIndexedSeq
    val lastPart = segs.lastIndexWhere(_.contains('='))
    if (lastPart < 0) throw new IllegalArgumentException(s"No partitions in this filepath $filepath")
    segs.take(lastPart + 1).mkString("/")
  }

  /** Escape a value for a single-quoted SQL literal — partition values are
    * data-derived, so an apostrophe must not break (or inject into) the
    * generated statement.
    */
  private def sqlQuote(v: String): String = v.replace("'", "''")

  /** ALTER TABLE … ADD PARTITION for one written data file
    * (publish_redshift.py:300 `create_partitions`).
    */
  def addPartitionDdl(bucket: String, schemaName: String, tableName: String,
                      filepath: String): String = {
    val formatted = partitionsOf(filepath).map { p =>
      val Array(k, v) = p.split("=", 2)
      s"$k='${sqlQuote(graft.core.Fetch.unescapePathName(v))}'"
    }
    s"ALTER TABLE $schemaName.$tableName ADD IF NOT EXISTS PARTITION (${formatted.mkString(", ")}) " +
      s"LOCATION 's3://$bucket/${partitionLocation(filepath)}';"
  }

  /** Batch form: one ADD PARTITION statement per distinct partition
    * directory across all written files (the reference loops files,
    * publish_parq.py:255-257; distinct-dir batching avoids re-adding the
    * same partition once per file).
    */
  def addPartitionsDdl(bucket: String, schemaName: String, tableName: String,
                       filepaths: Seq[String]): Seq[String] =
    filepaths.filter(_.contains('='))
      .map(partitionLocation).distinct.sorted
      .map(dir => addPartitionDdl(bucket, schemaName, tableName, dir + "/file.parquet"))
}
