package graft.sinks

import org.apache.spark.sql.types._

/** Cassandra DDL management — CREATE/ALTER/INSERT statement generation
  * with schema-diffing, from a Spark StructType. Mirrors the reference's
  * CassandraSchemaManager (common/schema/cassandra/CassandraSchemaManager
  * .java:99-146 create/alter, :186-210 system_schema introspection) and
  * the type table of CassandraSchemaField.java:56-86. Statement generation
  * is pure (unit-testable without a cluster); execution goes through
  * whatever driver/connector the deployment provides.
  */
object Cql {

  /** Spark -> CQL type mapping (CassandraSchemaField.java:56-86; Spark
    * natively adds date/decimal which the reference lacked). */
  def cqlType(dt: DataType): String = dt match {
    case BooleanType => "boolean"
    case IntegerType | ShortType | ByteType => "int"
    case LongType => "bigint"
    case FloatType => "float"
    case DoubleType => "double"
    case StringType => "text"
    case BinaryType => "blob"
    case TimestampType => "timestamp"
    case DateType => "date"
    case _: DecimalType => "decimal"
    case other => throw new IllegalArgumentException(s"no CQL mapping for $other")
  }

  final case class TableSchema(keyspace: String, table: String, fields: StructType,
                               partitionKeys: Seq[String],
                               clusteringKeys: Seq[(String, String)] = Nil) {
    require(partitionKeys.nonEmpty, "at least one partition key required")
    private val names = fields.fieldNames.toSet
    (partitionKeys ++ clusteringKeys.map(_._1)).foreach(k =>
      require(names.contains(k), s"key column '$k' missing from schema"))

    def columnTypes: Map[String, String] =
      fields.fields.map(f => f.name -> cqlType(f.dataType)).toMap

    /** CREATE TABLE IF NOT EXISTS (CassandraSchemaManager.java:99-112). */
    def createTableCql: String = {
      val cols = fields.fields.map(f => s"${f.name} ${cqlType(f.dataType)}").mkString(", ")
      val pk =
        if (clusteringKeys.isEmpty) s"PRIMARY KEY ((${partitionKeys.mkString(", ")}))"
        else s"PRIMARY KEY ((${partitionKeys.mkString(", ")}), ${clusteringKeys.map(_._1).mkString(", ")})"
      val order =
        if (clusteringKeys.isEmpty) ""
        else s" WITH CLUSTERING ORDER BY (${clusteringKeys.map { case (c, o) => s"$c $o" }.mkString(", ")})"
      s"CREATE TABLE IF NOT EXISTS $keyspace.$table ($cols, $pk)$order"
    }

    /** ALTER statements for columns the live table lacks; incompatible
      * existing types fail the job (CassandraSchemaManager.java:120-146:
      * "the schema is the source of truth"). */
    def alterTableCql(existingColumns: Map[String, String]): Seq[String] =
      fields.fields.toSeq.flatMap { f =>
        val t = cqlType(f.dataType)
        existingColumns.get(f.name) match {
          case Some(existing) if existing != t =>
            throw new IllegalStateException(
              s"Incompatible field types for ${f.name}: sink has $existing and source has $t")
          case Some(_) => None
          case None => Some(s"ALTER TABLE $keyspace.$table ADD ${f.name} $t")
        }
      }

    /** Prepared INSERT with optional TTL / write timestamp
      * (CassandraSchemaManager.generateInsertStmt). */
    def insertCql(ttlSeconds: Option[Long] = None,
                  writeTimestampMicros: Option[Long] = None): String = {
      val cols = fields.fieldNames.mkString(", ")
      val binds = fields.fieldNames.map(_ => "?").mkString(", ")
      val using = (ttlSeconds.map(t => s"TTL $t") ++
        writeTimestampMicros.map(t => s"TIMESTAMP $t")).mkString(" AND ")
      val suffix = if (using.isEmpty) "" else s" USING $using"
      s"INSERT INTO $keyspace.$table ($cols) VALUES ($binds)$suffix"
    }

    /** Introspection query for the live column map
      * (CassandraSchemaManager.java:186-199). */
    def columnsQueryCql: String =
      s"SELECT column_name, type FROM system_schema.columns " +
        s"WHERE keyspace_name = '$keyspace' AND table_name = '$table'"
  }

  def createKeyspaceCql(keyspace: String, replicationFactor: Int = 3): String =
    s"CREATE KEYSPACE IF NOT EXISTS $keyspace WITH replication = " +
      s"{'class': 'SimpleStrategy', 'replication_factor': $replicationFactor}"
}
