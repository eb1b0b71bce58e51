/*
 * Minimal in-memory Spark DataSource-V2 catalog with GROUP-BASED
 * (copy-on-write) row-level operation support — the "filesystem catalog
 * equivalent" that lets the sandbox EXECUTE IcebergIO's MERGE INTO branch
 * (search_engine_spark/sources/tableio.py) without the Iceberg runtime
 * jar, which cannot be vendored here (no network). It implements exactly
 * the DSv2 contracts Iceberg's SparkCatalog implements for MERGE
 * (SupportsRowLevelOperations -> RowLevelOperation(MERGE) -> scan +
 * replace-write), so the MERGE statements IcebergIO emits are analyzed,
 * rewritten (RewriteMergeIntoTable) and executed for real.
 *
 * Storage is a static in-JVM map (rows as Object[] of JVM-serializable
 * values), valid because tests run Spark in local mode where executors
 * share the driver JVM; writer tasks still round-trip rows through
 * Serializable WriterCommitMessages, so the commit protocol is the real
 * distributed one. The whole table is a single rewrite group: a
 * row-level write REPLACES the table contents with the written rows —
 * the degenerate (one-group) case of Iceberg's copy-on-write.
 *
 * Supported column types: the ones the tableio tests use
 * (string/long/int/double/boolean/timestamp/date/binary).
 *
 * Compiled on the fly by tests/test_tableio.py with the JDK in this
 * sandbox; no binary artifacts are committed.
 */
package sesparktest;

import java.io.Serializable;
import java.util.ArrayList;
import java.util.Arrays;
import java.util.HashMap;
import java.util.HashSet;
import java.util.List;
import java.util.Map;
import java.util.Set;
import java.util.concurrent.ConcurrentHashMap;

import org.apache.spark.sql.catalyst.InternalRow;
import org.apache.spark.sql.catalyst.analysis.NoSuchNamespaceException;
import org.apache.spark.sql.catalyst.analysis.NoSuchTableException;
import org.apache.spark.sql.catalyst.analysis.TableAlreadyExistsException;
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow;
import org.apache.spark.sql.connector.catalog.Identifier;
import org.apache.spark.sql.connector.catalog.SupportsNamespaces;
import org.apache.spark.sql.connector.catalog.SupportsRead;
import org.apache.spark.sql.connector.catalog.SupportsRowLevelOperations;
import org.apache.spark.sql.connector.catalog.SupportsWrite;
import org.apache.spark.sql.connector.catalog.Table;
import org.apache.spark.sql.connector.catalog.TableCapability;
import org.apache.spark.sql.connector.catalog.TableCatalog;
import org.apache.spark.sql.connector.catalog.TableChange;
import org.apache.spark.sql.connector.catalog.NamespaceChange;
import org.apache.spark.sql.connector.expressions.Expressions;
import org.apache.spark.sql.connector.expressions.NamedReference;
import org.apache.spark.sql.connector.expressions.Transform;
import org.apache.spark.sql.connector.read.Batch;
import org.apache.spark.sql.connector.read.InputPartition;
import org.apache.spark.sql.connector.read.PartitionReader;
import org.apache.spark.sql.connector.read.PartitionReaderFactory;
import org.apache.spark.sql.connector.read.Scan;
import org.apache.spark.sql.connector.read.ScanBuilder;
import org.apache.spark.sql.connector.write.BatchWrite;
import org.apache.spark.sql.connector.write.DataWriter;
import org.apache.spark.sql.connector.write.DataWriterFactory;
import org.apache.spark.sql.connector.write.DeltaBatchWrite;
import org.apache.spark.sql.connector.write.DeltaWrite;
import org.apache.spark.sql.connector.write.DeltaWriteBuilder;
import org.apache.spark.sql.connector.write.DeltaWriter;
import org.apache.spark.sql.connector.write.DeltaWriterFactory;
import org.apache.spark.sql.connector.write.LogicalWriteInfo;
import org.apache.spark.sql.connector.write.PhysicalWriteInfo;
import org.apache.spark.sql.connector.write.RowLevelOperation;
import org.apache.spark.sql.connector.write.RowLevelOperationBuilder;
import org.apache.spark.sql.connector.write.RowLevelOperationInfo;
import org.apache.spark.sql.connector.write.SupportsDelta;
import org.apache.spark.sql.connector.write.SupportsTruncate;
import org.apache.spark.sql.connector.write.Write;
import org.apache.spark.sql.connector.write.WriteBuilder;
import org.apache.spark.sql.connector.write.WriterCommitMessage;
import org.apache.spark.sql.types.BinaryType;
import org.apache.spark.sql.types.BooleanType;
import org.apache.spark.sql.types.DataType;
import org.apache.spark.sql.types.DateType;
import org.apache.spark.sql.types.DoubleType;
import org.apache.spark.sql.types.FloatType;
import org.apache.spark.sql.types.IntegerType;
import org.apache.spark.sql.types.LongType;
import org.apache.spark.sql.types.StringType;
import org.apache.spark.sql.types.StructField;
import org.apache.spark.sql.types.StructType;
import org.apache.spark.sql.types.TimestampNTZType;
import org.apache.spark.sql.types.TimestampType;
import org.apache.spark.sql.util.CaseInsensitiveStringMap;
import org.apache.spark.unsafe.types.UTF8String;

public class RowLevelTestCatalog implements TableCatalog, SupportsNamespaces {

  /** table key -> state; static so reader/writer tasks (same JVM in
   * local mode) and the catalog all see one store. */
  static final Map<String, TableState> STORE = new ConcurrentHashMap<>();

  static class TableState {
    final StructType schema;
    final List<Object[]> rows = new ArrayList<>();
    TableState(StructType schema) { this.schema = schema; }
  }

  private String name = "rowlevel";
  /** catalog option mode=merge-on-read switches row-level operations from
   * the group-based (copy-on-write) path to the delta-based path — the
   * mode Iceberg v2 tables default to on real clusters. */
  private boolean mergeOnRead = false;

  @Override public void initialize(String name, CaseInsensitiveStringMap options) {
    this.name = name;
    this.mergeOnRead = "merge-on-read".equals(options.get("mode"));
  }

  @Override public String name() { return name; }

  private String key(Identifier ident) {
    return name + "\0" + String.join(".", ident.namespace()) + "." + ident.name();
  }

  @Override public Identifier[] listTables(String[] namespace) {
    List<Identifier> out = new ArrayList<>();
    String prefix = name + "\0" + String.join(".", namespace) + ".";
    for (String k : STORE.keySet()) {
      if (k.startsWith(prefix)) {
        out.add(Identifier.of(namespace, k.substring(prefix.length())));
      }
    }
    return out.toArray(new Identifier[0]);
  }

  @Override public Table loadTable(Identifier ident) throws NoSuchTableException {
    TableState st = STORE.get(key(ident));
    if (st == null) throw new NoSuchTableException(ident);
    return new MemTable(key(ident), st.schema, mergeOnRead);
  }

  @Override public Table createTable(Identifier ident, StructType schema,
      Transform[] partitions, Map<String, String> properties)
      throws TableAlreadyExistsException {
    if (STORE.containsKey(key(ident))) throw new TableAlreadyExistsException(ident);
    STORE.put(key(ident), new TableState(schema));
    return new MemTable(key(ident), schema, mergeOnRead);
  }

  @Override public Table alterTable(Identifier ident, TableChange... changes)
      throws NoSuchTableException {
    return loadTable(ident);
  }

  @Override public boolean dropTable(Identifier ident) {
    return STORE.remove(key(ident)) != null;
  }

  @Override public void renameTable(Identifier from, Identifier to)
      throws NoSuchTableException {
    TableState st = STORE.remove(key(from));
    if (st == null) throw new NoSuchTableException(from);
    STORE.put(key(to), st);
  }

  // -- SupportsNamespaces: every namespace implicitly exists ------------
  @Override public String[][] listNamespaces() { return new String[][] {}; }
  @Override public String[][] listNamespaces(String[] namespace) { return new String[][] {}; }
  @Override public boolean namespaceExists(String[] namespace) { return true; }
  @Override public Map<String, String> loadNamespaceMetadata(String[] namespace) {
    return new HashMap<>();
  }
  @Override public void createNamespace(String[] namespace, Map<String, String> metadata) {}
  @Override public void alterNamespace(String[] namespace, NamespaceChange... changes) {}
  @Override public boolean dropNamespace(String[] namespace, boolean cascade) { return true; }

  // ---------------------------------------------------------------------
  static Object toStorage(InternalRow row, int i, DataType dt) {
    if (row.isNullAt(i)) return null;
    if (dt instanceof StringType) return row.getUTF8String(i).toString();
    if (dt instanceof LongType || dt instanceof TimestampType
        || dt instanceof TimestampNTZType) return row.getLong(i);
    if (dt instanceof IntegerType || dt instanceof DateType) return row.getInt(i);
    if (dt instanceof DoubleType) return row.getDouble(i);
    if (dt instanceof FloatType) return row.getFloat(i);
    if (dt instanceof BooleanType) return row.getBoolean(i);
    if (dt instanceof BinaryType) return row.getBinary(i);
    throw new UnsupportedOperationException("type: " + dt);
  }

  static Object toCatalyst(Object v, DataType dt) {
    if (v == null) return null;
    if (dt instanceof StringType) return UTF8String.fromString((String) v);
    return v;
  }

  // ---------------------------------------------------------------------
  static class MemTable implements SupportsRead, SupportsWrite, SupportsRowLevelOperations {
    final String key;
    final StructType schema;
    final boolean mergeOnRead;
    MemTable(String key, StructType schema, boolean mergeOnRead) {
      this.key = key; this.mergeOnRead = mergeOnRead;
      if (mergeOnRead) {
        // WriteDelta rejects nullable row-id attributes
        // (NULLABLE_ROW_ID_ATTRIBUTES); the first column is this
        // catalog's row identity (a primary key), so declare it NOT NULL
        StructField[] fs = schema.fields().clone();
        fs[0] = new StructField(fs[0].name(), fs[0].dataType(), false,
            fs[0].metadata());
        this.schema = new StructType(fs);
      } else {
        this.schema = schema;
      }
    }

    @Override public String name() { return key.replace('\0', '.'); }
    @Override public StructType schema() { return schema; }
    @Override public Set<TableCapability> capabilities() {
      return new HashSet<>(Arrays.asList(
          TableCapability.BATCH_READ, TableCapability.BATCH_WRITE,
          TableCapability.TRUNCATE));
    }

    @Override public ScanBuilder newScanBuilder(CaseInsensitiveStringMap options) {
      return () -> new MemScan(key, schema);
    }

    @Override public WriteBuilder newWriteBuilder(LogicalWriteInfo info) {
      return new MemWriteBuilder(key, info.schema(), false);
    }

    @Override public RowLevelOperationBuilder newRowLevelOperationBuilder(
        RowLevelOperationInfo info) {
      if (mergeOnRead) {
        return () -> new MemDeltaOp(key, schema, info.command());
      }
      return () -> new MemRowLevelOp(key, schema, info.command());
    }
  }

  // -- read path --------------------------------------------------------
  static class MemScan implements Scan, Batch {
    final String key;
    final StructType schema;
    MemScan(String key, StructType schema) { this.key = key; this.schema = schema; }
    @Override public StructType readSchema() { return schema; }
    @Override public Batch toBatch() { return this; }
    @Override public InputPartition[] planInputPartitions() {
      return new InputPartition[] { new MemPartition(key) };
    }
    @Override public PartitionReaderFactory createReaderFactory() {
      return new MemReaderFactory(schema);
    }
  }

  static class MemPartition implements InputPartition, Serializable {
    final String key;
    MemPartition(String key) { this.key = key; }
  }

  static class MemReaderFactory implements PartitionReaderFactory {
    final StructType schema;
    MemReaderFactory(StructType schema) { this.schema = schema; }
    @Override public PartitionReader<InternalRow> createReader(InputPartition p) {
      TableState st = STORE.get(((MemPartition) p).key);
      final List<Object[]> rows;
      synchronized (st.rows) { rows = new ArrayList<>(st.rows); }
      return new PartitionReader<InternalRow>() {
        int i = -1;
        @Override public boolean next() { return ++i < rows.size(); }
        @Override public InternalRow get() {
          Object[] raw = rows.get(i);
          Object[] vals = new Object[raw.length];
          StructField[] fields = schema.fields();
          for (int j = 0; j < raw.length; j++) {
            vals[j] = toCatalyst(raw[j], fields[j].dataType());
          }
          return new GenericInternalRow(vals);
        }
        @Override public void close() {}
      };
    }
  }

  // -- write path -------------------------------------------------------
  static class MemWriteBuilder implements WriteBuilder, SupportsTruncate {
    final String key;
    final StructType schema;
    boolean replace;
    MemWriteBuilder(String key, StructType schema, boolean replace) {
      this.key = key; this.schema = schema; this.replace = replace;
    }
    @Override public WriteBuilder truncate() { this.replace = true; return this; }
    @Override public Write build() {
      return new Write() {
        @Override public BatchWrite toBatch() {
          return new MemBatchWrite(key, schema, replace);
        }
      };
    }
  }

  static class MemBatchWrite implements BatchWrite {
    final String key;
    final StructType schema;
    final boolean replace;
    MemBatchWrite(String key, StructType schema, boolean replace) {
      this.key = key; this.schema = schema; this.replace = replace;
    }
    @Override public DataWriterFactory createBatchWriterFactory(PhysicalWriteInfo info) {
      // the (row-level) write schema's column ORDER need not match the
      // table schema (ReplaceData projects in plan order) — map by name
      return new MemWriterFactory(schema, STORE.get(key).schema);
    }
    @Override public void commit(WriterCommitMessage[] messages) {
      TableState st = STORE.get(key);
      synchronized (st.rows) {
        if (replace) st.rows.clear();
        for (WriterCommitMessage m : messages) {
          st.rows.addAll(((RowsMessage) m).rows);
        }
      }
    }
    @Override public void abort(WriterCommitMessage[] messages) {}
  }

  static class MemWriterFactory implements DataWriterFactory {
    final StructType writeSchema;
    final StructType tableSchema;
    MemWriterFactory(StructType writeSchema, StructType tableSchema) {
      this.writeSchema = writeSchema; this.tableSchema = tableSchema;
    }
    @Override public DataWriter<InternalRow> createWriter(int partitionId, long taskId) {
      final List<Object[]> buf = new ArrayList<>();
      final StructField[] in = writeSchema.fields();
      final StructField[] out = tableSchema.fields();
      // storage is in TABLE order; incoming rows are in WRITE order
      final int[] src = new int[out.length];
      for (int j = 0; j < out.length; j++) {
        src[j] = writeSchema.fieldIndex(out[j].name());
      }
      return new DataWriter<InternalRow>() {
        @Override public void write(InternalRow row) {
          // group-based MERGE/UPDATE/DELETE rewrites prepend one
          // operation column to the physical rows (MergeRowsExec);
          // plain appends do not — detect by arity and skip it
          int off = row.numFields() - in.length;
          Object[] vals = new Object[out.length];
          for (int j = 0; j < out.length; j++) {
            vals[j] = toStorage(row, off + src[j], in[src[j]].dataType());
          }
          buf.add(vals);
        }
        @Override public WriterCommitMessage commit() { return new RowsMessage(buf); }
        @Override public void abort() {}
        @Override public void close() {}
      };
    }
  }

  static class RowsMessage implements WriterCommitMessage, Serializable {
    final ArrayList<Object[]> rows;
    RowsMessage(List<Object[]> rows) { this.rows = new ArrayList<>(rows); }
  }

  // -- row-level operations (MERGE / UPDATE / DELETE), group-based ------
  static class MemRowLevelOp implements RowLevelOperation {
    final String key;
    final StructType schema;
    final Command command;
    MemRowLevelOp(String key, StructType schema, Command command) {
      this.key = key; this.schema = schema; this.command = command;
    }
    @Override public Command command() { return command; }
    @Override public ScanBuilder newScanBuilder(CaseInsensitiveStringMap options) {
      return () -> new MemScan(key, schema);
    }
    @Override public WriteBuilder newWriteBuilder(LogicalWriteInfo info) {
      // the whole table is one copy-on-write group: the rewrite write
      // replaces the full contents with the post-operation rows
      return new MemWriteBuilder(key, info.schema(), true);
    }
  }

  // -- row-level operations, DELTA-BASED (merge-on-read) ----------------
  // The other RowLevelOperation contract Spark can plan
  // (RewriteMergeIntoTable -> WriteDelta/WriteDeltaExec): instead of
  // rewriting whole groups, the writer receives per-row DELETE / UPDATE /
  // INSERT instructions keyed by a row identity — the shape Iceberg v2
  // merge-on-read tables (position/equality delete files) present. The
  // storage's row identity is its FIRST column, treated as a primary key
  // (the analog of Iceberg's _file/_pos metadata pair for an in-memory
  // list; both driver tables — t(k, v) and articles(url, ...) — are keyed
  // on their first column).
  static class MemDeltaOp implements SupportsDelta {
    final String key;
    final StructType schema;
    final Command command;
    MemDeltaOp(String key, StructType schema, Command command) {
      this.key = key; this.schema = schema; this.command = command;
    }
    @Override public Command command() { return command; }
    @Override public NamedReference[] rowId() {
      return new NamedReference[] {
        Expressions.column(schema.fields()[0].name())
      };
    }
    @Override public ScanBuilder newScanBuilder(CaseInsensitiveStringMap options) {
      return () -> new MemScan(key, schema);
    }
    @Override public DeltaWriteBuilder newWriteBuilder(LogicalWriteInfo info) {
      StructType idSchema = info.rowIdSchema().get();
      StructType dataSchema = info.schema();
      return new DeltaWriteBuilder() {
        @Override public DeltaWrite build() {
          return new DeltaWrite() {
            @Override public DeltaBatchWrite toBatch() {
              return new MemDeltaBatchWrite(key, dataSchema, idSchema);
            }
          };
        }
      };
    }
  }

  /** one delta instruction: op 'D' (id), 'U' (id + row), 'I' (row). */
  static class DeltaOp implements Serializable {
    final char op;
    final Object id;
    final Object[] row;
    DeltaOp(char op, Object id, Object[] row) {
      this.op = op; this.id = id; this.row = row;
    }
  }

  static class DeltaMessage implements WriterCommitMessage, Serializable {
    final ArrayList<DeltaOp> ops;
    DeltaMessage(List<DeltaOp> ops) { this.ops = new ArrayList<>(ops); }
  }

  static class MemDeltaBatchWrite implements DeltaBatchWrite {
    final String key;
    final StructType dataSchema;
    final StructType idSchema;
    MemDeltaBatchWrite(String key, StructType dataSchema, StructType idSchema) {
      this.key = key; this.dataSchema = dataSchema; this.idSchema = idSchema;
    }
    @Override public DeltaWriterFactory createBatchWriterFactory(PhysicalWriteInfo info) {
      return new MemDeltaWriterFactory(dataSchema, idSchema, STORE.get(key).schema);
    }
    @Override public void commit(WriterCommitMessage[] messages) {
      TableState st = STORE.get(key);
      int idOrdinal = st.schema.fieldIndex(st.schema.fields()[0].name());
      synchronized (st.rows) {
        // deletes and update-removals first, then the replacement and
        // inserted rows (MERGE guarantees at most one match per target
        // row, so ordering across messages cannot conflict)
        for (WriterCommitMessage m : messages) {
          for (DeltaOp op : ((DeltaMessage) m).ops) {
            if (op.op == 'D' || op.op == 'U') {
              boolean removed = st.rows.removeIf(
                  r -> java.util.Objects.equals(r[idOrdinal], op.id));
              if (!removed) {
                throw new IllegalStateException(
                    "delta " + op.op + " for absent row id " + op.id);
              }
            }
          }
        }
        for (WriterCommitMessage m : messages) {
          for (DeltaOp op : ((DeltaMessage) m).ops) {
            if (op.op == 'U' || op.op == 'I') st.rows.add(op.row);
          }
        }
      }
    }
    @Override public void abort(WriterCommitMessage[] messages) {}
  }

  static class MemDeltaWriterFactory implements DeltaWriterFactory {
    final StructType dataSchema;
    final StructType idSchema;
    final StructType tableSchema;
    MemDeltaWriterFactory(StructType dataSchema, StructType idSchema,
        StructType tableSchema) {
      this.dataSchema = dataSchema; this.idSchema = idSchema;
      this.tableSchema = tableSchema;
    }
    @Override public DeltaWriter<InternalRow> createWriter(int partitionId, long taskId) {
      final List<DeltaOp> buf = new ArrayList<>();
      final StructField[] out = tableSchema.fields();
      final DataType idType = idSchema.fields()[0].dataType();
      // incoming data rows are in WRITE order; storage is in TABLE order
      final int[] src = new int[out.length];
      for (int j = 0; j < out.length; j++) {
        src[j] = dataSchema.fieldIndex(out[j].name());
      }
      return new DeltaWriter<InternalRow>() {
        private Object idOf(InternalRow id) { return toStorage(id, 0, idType); }
        private Object[] rowOf(InternalRow row) {
          Object[] vals = new Object[out.length];
          for (int j = 0; j < out.length; j++) {
            vals[j] = toStorage(row, src[j], dataSchema.fields()[src[j]].dataType());
          }
          return vals;
        }
        @Override public void delete(InternalRow meta, InternalRow id) {
          buf.add(new DeltaOp('D', idOf(id), null));
        }
        @Override public void update(InternalRow meta, InternalRow id, InternalRow row) {
          buf.add(new DeltaOp('U', idOf(id), rowOf(row)));
        }
        @Override public void insert(InternalRow row) {
          buf.add(new DeltaOp('I', null, rowOf(row)));
        }
        @Override public WriterCommitMessage commit() { return new DeltaMessage(buf); }
        @Override public void abort() {}
        @Override public void close() {}
      };
    }
  }
}
