package graft

import java.nio.file.Files

import graft.api.Rbac
import graft.api.Rbac.{Role, User}

/** RBAC semantics vs the reference's user/role services
  * (internal/master/services/user_service.go, role_service.go,
  * internal/entity/user.go) — CRUD validation paths, grant/revoke
  * privilege merge, the endpoint→(resource, verb) parse, the
  * middleware's auth order, and sidecar persistence across instances.
  */
class RbacSpec extends SparkSpec {

  private def fresh(): Rbac = {
    spark // force the shared session so SidecarIO sees its Hadoop conf
    new Rbac(Files.createTempDirectory("rbac").toString)
  }

  test("builtin roles resolve without storage and cannot be shadowed, deleted, or mutated") {
    val rbac = fresh()
    val r = rbac.queryRole("defaultSpaceAdmin")
    assert(r.privileges("ResourceDocument") == Rbac.PrivWriteRead)
    assert(r.privileges("ResourceAlias") == Rbac.PrivReadOnly)
    intercept[IllegalArgumentException] {
      rbac.createRole(Role("defaultSpaceAdmin", Map("ResourceDB" -> "WriteRead")))
    }
    intercept[IllegalArgumentException] { rbac.deleteRole("defaultSpaceAdmin") }
    intercept[IllegalArgumentException] {
      rbac.changeRolePrivilege(Role("defaultSpaceAdmin",
        Map("ResourceDB" -> "WriteRead"), operator = Some(Rbac.OpGrant)))
    }
    // root is reserved at validation (user.go:182-186)
    intercept[IllegalArgumentException] { rbac.createRole(Role("root")) }
    intercept[IllegalArgumentException] { rbac.createRole(Role("ROOT")) }
  }

  test("name validation mirrors ValidateName (user.go:164-189)") {
    val rbac = fresh()
    intercept[IllegalArgumentException] { rbac.createRole(Role("")) }
    intercept[IllegalArgumentException] { rbac.createRole(Role("1abc")) }
    intercept[IllegalArgumentException] { rbac.createRole(Role("_abc")) }
    intercept[IllegalArgumentException] { rbac.createRole(Role("a b")) }
    intercept[IllegalArgumentException] { rbac.createRole(Role("a*b")) }
    intercept[IllegalArgumentException] { rbac.createRole(Role("a?b")) }
    // bad resource / privilege values reject (user.go:278-293)
    intercept[IllegalArgumentException] {
      rbac.createRole(Role("r1", Map("ResourceNope" -> "ReadOnly")))
    }
    intercept[IllegalArgumentException] {
      rbac.createRole(Role("r1", Map("ResourceDB" -> "Everything")))
    }
  }

  test("role CRUD + grant/revoke privilege merge (role_service.go:180-230)") {
    val rbac = fresh()
    rbac.createRole(Role("analyst", Map("ResourceDocument" -> "ReadOnly")))
    intercept[IllegalArgumentException] { // duplicate
      rbac.createRole(Role("analyst", Map.empty))
    }
    // Grant merges/overwrites
    val g = rbac.changeRolePrivilege(Role("analyst",
      Map("ResourceDocument" -> "WriteRead", "ResourceIndex" -> "ReadOnly"),
      operator = Some(Rbac.OpGrant)))
    assert(g.privileges == Map(
      "ResourceDocument" -> "WriteRead", "ResourceIndex" -> "ReadOnly"))
    // Revoke deletes the named resources (values ignored)
    val v = rbac.changeRolePrivilege(Role("analyst",
      Map("ResourceIndex" -> "ReadOnly"), operator = Some(Rbac.OpRevoke)))
    assert(v.privileges == Map("ResourceDocument" -> "WriteRead"))
    // missing operator rejects (role.Validate allows empty; the change
    // verb requires Grant|Revoke)
    intercept[IllegalArgumentException] {
      rbac.changeRolePrivilege(Role("analyst", Map("ResourceDB" -> "ReadOnly")))
    }
    assert(rbac.queryAllRoles().map(_.name) == Seq("analyst"))
    rbac.deleteRole("analyst")
    intercept[NoSuchElementException] { rbac.queryRole("analyst") }
    intercept[NoSuchElementException] { rbac.deleteRole("analyst") }
  }

  test("user CRUD guards (user_service.go:39-114)") {
    val rbac = fresh()
    // role must exist
    intercept[NoSuchElementException] {
      rbac.createUser(User("u1", Some("pw"), roleName = Some("ghost")))
    }
    // role name required
    intercept[IllegalArgumentException] {
      rbac.createUser(User("u1", Some("pw")))
    }
    // password required
    intercept[IllegalArgumentException] {
      rbac.createUser(User("u1", roleName = Some("defaultDocumentAdmin")))
    }
    // role "root" rejected for non-root creates (user.go:338-342)
    intercept[IllegalArgumentException] {
      rbac.createUser(User("u1", Some("pw"), roleName = Some("root")))
    }
    rbac.createUser(User("u1", Some("pw"), roleName = Some("defaultDocumentAdmin")))
    intercept[IllegalArgumentException] { // duplicate
      rbac.createUser(User("u1", Some("pw2"), roleName = Some("defaultDocumentAdmin")))
    }
    val ur = rbac.queryUser("u1")
    assert(ur.role.name == "defaultDocumentAdmin")
    assert(ur.password.isEmpty) // password never rides QueryUser
    assert(rbac.queryUserWithPassword("u1").password.contains("pw"))
    intercept[IllegalArgumentException] { rbac.deleteUser("root") }
    rbac.deleteUser("u1")
    intercept[NoSuchElementException] { rbac.queryUser("u1") }
  }

  test("remaining badcases from the reference's test_module_user matrix") {
    val rbac = fresh()
    // create a user literally named root (checkRoot path, user.go:182-186)
    intercept[IllegalArgumentException] {
      rbac.createUser(User("root", Some("pw"), roleName = Some("defaultDocumentAdmin")))
    }
    // update a user that doesn't exist
    intercept[NoSuchElementException] {
      rbac.updateUser(User("ghost", Some("pw"), Some("old")), authUser = "ghost")
    }
    // update to a role that doesn't exist
    rbac.createUser(User("u3", Some("pw"), roleName = Some("defaultDocumentAdmin")))
    intercept[NoSuchElementException] {
      rbac.updateUser(User("u3", roleName = Some("ghost_role")), authUser = "u3")
    }
    // root updating ITS OWN password still needs the old one
    // (user_service.go:203 applies the root shortcut only to OTHER users)
    rbac.ensureRoot("rootpw")
    intercept[IllegalArgumentException] {
      rbac.updateUser(User("root", Some("new")), authUser = "root")
    }
    rbac.updateUser(User("root", Some("new"), Some("rootpw")), authUser = "root")
    assert(rbac.queryUserWithPassword("root").password.contains("new"))
  }

  test("ensureRoot is create-if-absent (server.go:160-181): rotated root password survives restart") {
    val rbac = fresh()
    rbac.ensureRoot("configpw")
    // rotate through the API, then replay the startup bootstrap — the
    // rotation must survive (the reference only writes root when absent)
    rbac.updateUser(User("root", Some("rotated"), Some("configpw")), authUser = "root")
    rbac.ensureRoot("configpw")
    assert(rbac.queryUserWithPassword("root").password.contains("rotated"))
    assert(rbac.authorize("root", "rotated", "/users", "POST").role.name == "root")
    // the explicit rotate flag forces the config value (lost-root recovery)
    rbac.ensureRoot("configpw", rotate = true)
    assert(rbac.queryUserWithPassword("root").password.contains("configpw"))
  }

  test("updateUser is role XOR password with old-password checks (user_service.go:176-246)") {
    val rbac = fresh()
    rbac.createUser(User("u2", Some("pw"), roleName = Some("defaultDocumentAdmin")))
    // role + password together reject
    intercept[IllegalArgumentException] {
      rbac.updateUser(User("u2", Some("x"),
        roleName = Some("defaultSpaceAdmin")), authUser = "u2")
    }
    // role update keeps the stored password
    rbac.updateUser(User("u2", roleName = Some("defaultSpaceAdmin")), authUser = "u2")
    assert(rbac.queryUser("u2").role.name == "defaultSpaceAdmin")
    assert(rbac.queryUserWithPassword("u2").password.contains("pw"))
    // self password change needs the old password, and it must match
    intercept[IllegalArgumentException] {
      rbac.updateUser(User("u2", Some("new")), authUser = "u2")
    }
    intercept[IllegalArgumentException] {
      rbac.updateUser(User("u2", Some("new"), Some("wrong")), authUser = "u2")
    }
    // new == old rejects
    intercept[IllegalArgumentException] {
      rbac.updateUser(User("u2", Some("pw"), Some("pw")), authUser = "u2")
    }
    rbac.updateUser(User("u2", Some("new"), Some("pw")), authUser = "u2")
    assert(rbac.queryUserWithPassword("u2").password.contains("new"))
    // role survives a password update
    assert(rbac.queryUser("u2").role.name == "defaultSpaceAdmin")
    // root resets another user's password without the old one
    rbac.updateUser(User("u2", Some("reset")), authUser = "root")
    assert(rbac.queryUserWithPassword("u2").password.contains("reset"))
  }

  test("endpoint parse matches ParseResources (user.go:191-269)") {
    import Rbac.parseResources
    assert(parseResources("/dbs/db1", "GET") == ("ResourceDB", "ReadOnly"))
    assert(parseResources("/dbs/db1/spaces/s1", "PUT") == ("ResourceSpace", "WriteOnly"))
    assert(parseResources("/backup/db1", "POST") == ("ResourceSpace", "WriteOnly"))
    // document verbs: query/search read, upsert/delete write — regardless
    // of HTTP method (doc endpoints are all POST in the reference)
    assert(parseResources("/document/search", "POST") == ("ResourceDocument", "ReadOnly"))
    assert(parseResources("/document/query", "POST") == ("ResourceDocument", "ReadOnly"))
    assert(parseResources("/document/upsert", "POST") == ("ResourceDocument", "WriteOnly"))
    assert(parseResources("/document/delete", "POST") == ("ResourceDocument", "WriteOnly"))
    assert(parseResources("/index/rebuild", "POST") == ("ResourceIndex", "WriteOnly"))
    assert(parseResources("/alias/a1", "GET") == ("ResourceAlias", "ReadOnly"))
    assert(parseResources("/users", "POST") == ("ResourceUser", "WriteOnly"))
    assert(parseResources("/roles", "GET") == ("ResourceRole", "ReadOnly"))
    assert(parseResources("/config/c", "GET") == ("ResourceConfig", "ReadOnly"))
    assert(parseResources("/cache/x", "GET") == ("ResourceCache", "ReadOnly"))
    assert(parseResources("/cluster/health", "GET") == ("ResourceCluster", "ReadOnly"))
    assert(parseResources("/servers", "GET") == ("ResourceServer", "ReadOnly"))
    assert(parseResources("/partitions", "GET") == ("ResourcePartition", "ReadOnly"))
    assert(parseResources("/elsewhere", "GET") == ("ResourceAll", "ReadOnly"))
  }

  test("permission decision table (strict variant of user.go:300-313)") {
    val docRead = Rbac.RoleMap("defaultDocumentAdmin")
    assert(docRead.hasPermission("/document/search", "POST"))
    assert(docRead.hasPermission("/document/upsert", "POST"))
    assert(!docRead.hasPermission("/dbs/db1", "GET")) // absent resource denies
    val spaceAdmin = Rbac.RoleMap("defaultSpaceAdmin")
    assert(spaceAdmin.hasPermission("/alias/a1", "GET")) // ReadOnly admits read
    // the divergence: present-but-insufficient DENIES here (the
    // reference's fall-through would admit this write)
    assert(!spaceAdmin.hasPermission("/alias/a1", "PUT"))
    val none = Role("lockedout", Map("ResourceDocument" -> "None"))
    assert(!none.hasPermission("/document/search", "POST"))
    // ResourceAll grants apply to every resource; root name bypasses
    val all = Role("poweruser", Map("ResourceAll" -> "ReadOnly"))
    assert(all.hasPermission("/dbs/db1", "GET"))
    assert(!all.hasPermission("/dbs/db1", "PUT"))
    assert(Rbac.RootRole.hasPermission("/anything", "DELETE"))
  }

  test("authorize = credential check then permission check, failing closed") {
    val rbac = fresh()
    rbac.ensureRoot("rootpw")
    rbac.createRole(Role("reader", Map("ResourceDocument" -> "ReadOnly")))
    rbac.createUser(User("alice", Some("s3cret"), roleName = Some("reader")))
    // happy path
    val ur = rbac.authorize("alice", "s3cret", "/document/search", "POST")
    assert(ur.role.name == "reader")
    assert(rbac.authorize("root", "rootpw", "/users", "POST").role.name == "root")
    // unknown user / wrong password / missing privilege all refuse
    intercept[SecurityException] {
      rbac.authorize("mallory", "x", "/document/search", "POST")
    }
    intercept[SecurityException] {
      rbac.authorize("alice", "wrong", "/document/search", "POST")
    }
    intercept[SecurityException] {
      rbac.authorize("alice", "s3cret", "/document/upsert", "POST")
    }
    // revoking the privilege takes effect on the next request
    rbac.changeRolePrivilege(Role("reader",
      Map("ResourceDocument" -> "ReadOnly"), operator = Some(Rbac.OpRevoke)))
    intercept[SecurityException] {
      rbac.authorize("alice", "s3cret", "/document/search", "POST")
    }
  }

  test("users and roles persist across Rbac instances (sidecar round-trip)") {
    spark
    val root = Files.createTempDirectory("rbac_rt").toString
    val a = new Rbac(root)
    a.createRole(Role("ops", Map("ResourceCluster" -> "WriteRead")))
    a.createUser(User("bob", Some("pw"), roleName = Some("ops")))
    val b = new Rbac(root)
    assert(b.queryRole("ops").privileges == Map("ResourceCluster" -> "WriteRead"))
    assert(b.queryUser("bob").role.name == "ops")
    assert(b.queryAllUsers().map(_.name) == Seq("bob"))
    assert(b.authorize("bob", "pw", "/cluster/health", "GET").name == "bob")
  }
}
