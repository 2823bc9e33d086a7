// Test-classpath stand-ins for the MongoDB sync driver's PUBLIC surface —
// exactly the classes and signatures graft.sinks.Writers.ReflectiveMongoStore
// resolves by reflection (the real org.mongodb:mongodb-driver-sync artifact
// cannot be a test dependency: this build is offline/zero-egress). They
// record writes into a JVM-global sink TransportsSpec reads back through the
// executor-side path (the InMemoryStore pattern — local[n] shares the JVM).
// Scala objects emit static forwarders, so `MongoClients.create` and
// `Document.parse` resolve as the static methods the real driver exposes.

package com.mongodb {
  class ConnectionString(url: String) {
    /** "mongodb://host[:port]/db[?opts]" — the database is the first path
      * segment, like the real parser.
      */
    def getDatabase: String = {
      val after = url.substring(url.indexOf("//") + 2)
      val slash = after.indexOf('/')
      if (slash < 0) null
      else after.substring(slash + 1).split("[/?]")(0) match {
        case "" => null
        case s  => s
      }
    }
  }
}

package com.mongodb.client {
  object MongoClients {
    def create(url: String): MongoClient = new MongoClient(url)
  }

  class MongoClient(val url: String) {
    def getDatabase(name: String): MongoDatabase = new MongoDatabase(url, name)
    def close(): Unit = MongoStubSink.closed.incrementAndGet()
  }

  class MongoDatabase(url: String, name: String) {
    def getCollection(coll: String): MongoCollection =
      new MongoCollection(url, name, coll)
  }

  class MongoCollection(url: String, db: String, coll: String) {
    def insertMany(docs: java.util.List[_]): Unit = {
      import scala.jdk.CollectionConverters._
      MongoStubSink.record((url, db, coll),
        docs.asScala.toSeq.map(_.asInstanceOf[org.bson.Document].json))
    }
  }

  /** JVM-global sink the stub collections write into. */
  object MongoStubSink {
    val closed = new java.util.concurrent.atomic.AtomicLong()
    private val data =
      new java.util.concurrent.ConcurrentHashMap[(String, String, String),
        java.util.concurrent.ConcurrentLinkedQueue[String]]()
    def record(key: (String, String, String), docs: Seq[String]): Unit = {
      val q = data.computeIfAbsent(key,
        _ => new java.util.concurrent.ConcurrentLinkedQueue[String]())
      docs.foreach(q.add)
    }
    def collection(url: String, db: String, coll: String): Seq[String] = {
      import scala.jdk.CollectionConverters._
      Option(data.get((url, db, coll))).map(_.asScala.toSeq).getOrElse(Nil)
    }
    def clear(): Unit = { data.clear(); closed.set(0L) }
  }
}

package org.bson {
  object Document {
    def parse(json: String): Document = new Document(json)
  }
  class Document(val json: String)
}
